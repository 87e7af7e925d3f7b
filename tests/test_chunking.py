"""Fixed-token document chunking (operators.chunking): brute-force
Python replica parity on varied documents, coverage/overlap window
algebra, edge docs (NULL/empty/whitespace-only/short), and knob
validation."""

from __future__ import annotations

import math

import pytest

from idd_hw6_record_linkage_spark.operators.chunking import chunk_documents

DOCS = [
    (1, "a b c d e f g h i j"),  # 10 tokens
    (2, "one"),  # shorter than overlap
    (3, "  padded   with\tmixed\nwhitespace  tokens  "),
    (4, ""),  # no chunks
    (5, None),  # no chunks
    (6, " ".join(f"t{i}" for i in range(101))),  # many chunks, short tail
    (7, "x " * 24),  # exactly stride tokens (chunk=16, overlap=8)
]


def _brute(chunk_tokens, overlap):
    stride = chunk_tokens - overlap
    out = []
    for i, t in DOCS:
        toks = (t or "").split()
        n = len(toks)
        if n == 0:
            continue
        k = max(1, math.ceil((n - overlap) / stride))
        for c in range(k):
            w = toks[c * stride : c * stride + chunk_tokens]
            out.append((i, c, c * stride, len(w), " ".join(w)))
    return set(out)


@pytest.mark.parametrize("chunk_tokens,overlap", [(16, 8), (4, 0), (5, 4)])
def test_brute_force_parity(spark, chunk_tokens, overlap):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        tuple(r)
        for r in chunk_documents(
            df, "doc_id", "text", chunk_tokens, overlap
        ).collect()
    }
    assert got == _brute(chunk_tokens, overlap)


def test_windows_cover_and_overlap(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    rows = sorted(
        (
            r
            for r in chunk_documents(df, "doc_id", "text", 16, 8).collect()
            if r.id == 6
        ),
        key=lambda r: r.chunk_id,
    )
    # contiguous stride-8 starts: k = ceil((101-8)/8) = 12 chunks,
    # full coverage of 101 tokens (the last start, 88, reaches 100)
    assert [r.tok_start for r in rows] == list(range(0, 88 + 1, 8))
    assert rows[-1].tok_start + rows[-1].n_tokens == 101
    # every non-final window is full; adjacent windows share 8 tokens
    for a, b in zip(rows, rows[1:]):
        assert a.n_tokens == 16
        shared = a.chunk_text.split()[8:]
        assert b.chunk_text.split()[: len(shared)] == shared
    # no empty chunks anywhere, no rows for empty/NULL docs
    allrows = chunk_documents(df, "doc_id", "text", 16, 8).collect()
    assert all(r.n_tokens >= 1 for r in allrows)
    assert {r.id for r in allrows} == {1, 2, 3, 6, 7}


def test_knob_validation(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", 0, 0)
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", 8, 8)
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", 8, -1)
