"""Benchmark decontamination (operators.decontaminate): planted
verbatim spans between a probe set and a training corpus."""

from __future__ import annotations

import pytest

from idd_hw6_record_linkage_spark.operators import decontaminate as DC

SPAN = "the quick brown fox jumps over the lazy dog again and again yes"
W = len(SPAN.split())  # 13 tokens


def _corpus(spark, rows, idc="doc_id", tc="text"):
    return spark.createDataFrame(rows, f"{idc} long, {tc} string")


DOCS = [
    (1, "clean text with nothing shared at all here one two three four "
        "five six seven eight nine ten"),
    (2, f"prefix words before {SPAN} and suffix words after"),  # planted
    (3, SPAN),  # the probe text itself
    (4, "short doc"),  # < window tokens
    (5, None),  # NULL text
    (6, SPAN.replace("fox", "cat")),  # near-miss: one token differs
]
PROBES = [(100, SPAN)]


def test_contamination_stats_flags_planted_spans(spark):
    out = {
        r["doc_id"]: r
        for r in DC.contamination_stats(
            _corpus(spark, DOCS), _corpus(spark, PROBES),
            "doc_id", "text", "doc_id", "text", window=W,
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5, 6}  # every doc kept
    assert out[2]["is_contaminated"] and out[2]["n_contaminated"] >= 1
    assert out[3]["is_contaminated"] and out[3]["n_windows"] == 1
    for clean in (1, 4, 5, 6):
        assert not out[clean]["is_contaminated"], clean
    assert out[4]["n_windows"] == 0 and out[5]["n_windows"] == 0


def test_contamination_broadcast_off_equal(spark):
    docs, probes = _corpus(spark, DOCS), _corpus(spark, PROBES)
    a = sorted(
        map(tuple, DC.contamination_stats(
            docs, probes, "doc_id", "text", "doc_id", "text", window=W,
        ).collect())
    )
    b = sorted(
        map(tuple, DC.contamination_stats(
            docs, probes, "doc_id", "text", "doc_id", "text", window=W,
            broadcast_probes=False,
        ).collect())
    )
    assert a == b


def test_contamination_base_equivalence(spark):
    docs, probes = _corpus(spark, DOCS), _corpus(spark, PROBES)
    for base in ("xxhash64", "md5_60"):
        out = {
            r["doc_id"]: r["is_contaminated"]
            for r in DC.contamination_stats(
                docs, probes, "doc_id", "text", "doc_id", "text",
                window=W, base=base,
            ).collect()
        }
        assert out == {1: False, 2: True, 3: True, 4: False, 5: False,
                       6: False}, base


def test_contamination_stride_recall_trade(spark):
    """stride=1 catches a shared span at ANY alignment; a coarse
    corpus stride may miss it (the documented trade)."""
    # span planted at offset 1 inside a 2*W-token doc: stride W can
    # only hash windows at offsets 0 and W, neither aligns.
    doc = "x " + SPAN + " " + " ".join(f"f{i}" for i in range(W - 2))
    docs = _corpus(spark, [(1, doc)])
    probes = _corpus(spark, PROBES)
    fine = DC.contamination_stats(
        docs, probes, "doc_id", "text", "doc_id", "text", window=W,
    ).collect()[0]
    coarse = DC.contamination_stats(
        docs, probes, "doc_id", "text", "doc_id", "text", window=W,
        stride=W,
    ).collect()[0]
    assert fine["is_contaminated"]
    assert not coarse["is_contaminated"]


def test_probe_leak_report_counts_docs(spark):
    probes = _corpus(spark, PROBES + [(200, "never appears anywhere in "
                                            "the corpus at all not once "
                                            "surely truly")])
    out = {
        r["doc_id"]: r["n_leaked_docs"]
        for r in DC.probe_leak_report(
            _corpus(spark, DOCS), probes, "doc_id", "text",
            "doc_id", "text", window=W,
        ).collect()
    }
    assert out == {100: 2}  # docs 2 and 3; unleaked probe absent


def test_contamination_rejects_bad_params(spark):
    docs, probes = _corpus(spark, DOCS), _corpus(spark, PROBES)
    with pytest.raises(ValueError):
        DC.contamination_stats(
            docs, probes, "doc_id", "text", "doc_id", "text", window=0,
        )
