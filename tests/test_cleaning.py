"""Byte-identical clean_text parity (the F1 invariant, SURVEY §2.3).

`ref_clean_text` below restates the reference implementation
(/root/reference/scripts/preparazione_ML/clean_VIN_desc.py:5-18)
verbatim-in-semantics for value-by-value comparison; the engine's
native Catalyst expression must match it char-for-char.
"""

from __future__ import annotations

import re

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.functions.cleaning import (
    clean_text_expr,
    clean_text_py,
)


def ref_clean_text(text):
    # mirrors clean_VIN_desc.py:5-18 exactly
    if pd.isna(text):
        return ""
    text = str(text)
    text = text.encode("ascii", "ignore").decode("ascii")
    text = re.sub(r"[\n\r\t]", " ", text)
    text = re.sub(r"[^\w\s\d\.,!\?\-]", "", text)
    text = re.sub(r"\s+", " ", text).strip()
    return text


ADVERSARIAL = [
    None,
    "",
    " ",
    "\t\n\r",
    "hello world",
    "héllo wörld ★➔",
    "emoji \U0001f600\U0001f680 mixed",
    "tabs\tand\nnewlines\r\nhere",
    "punct: .,!?- kept; #$%^&*()[]{} dropped",
    "under_score digits 0123",
    "  leading and trailing  ",
    "\x0b\x0c vertical tab formfeed",
    "a" * 500,
    "Questión? ¡Sí! Überläuft",
    "mixed ASCII ascii 123 ... !!! ??? --- ,,,",
    "★",
    "no-break space",
    "cjk 中文 mixed",
]


def test_python_impl_matches_reference_semantics():
    for s in ADVERSARIAL:
        assert clean_text_py(s) == ref_clean_text(s)


def test_native_expr_matches_reference(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(ADVERSARIAL)], "i int, text string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", clean_text_expr("text").alias("c")).collect()
    }
    for i, s in enumerate(ADVERSARIAL):
        assert got[i] == ref_clean_text(s), f"mismatch on {s!r}"


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=80))
def test_python_impl_property(s):
    assert clean_text_py(s) == ref_clean_text(s)


def test_native_expr_property_batch(spark):
    # hypothesis per-example Spark roundtrips are slow; sample a corpus
    # once and compare in one job.
    import random

    rng = random.Random(42)
    pool = (
        [chr(c) for c in range(0x20, 0x7F)]
        + ["\t", "\n", "\r", "\x0b", "\x0c"]
        + ["★", "é", "中", "\U0001f600", " ", "ü", "➤"]
    )
    corpus = [
        "".join(rng.choice(pool) for _ in range(rng.randint(0, 60)))
        for _ in range(500)
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(corpus)], "i int, text string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", clean_text_expr("text").alias("c")).collect()
    }
    for i, s in enumerate(corpus):
        assert got[i] == ref_clean_text(s), f"mismatch on {s!r}"
