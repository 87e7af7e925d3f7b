"""Comparator unit tests (SURVEY §2.6 C1-C6) incl. recordlinkage
gauss-kernel semantics (record_linkage.py:292-295) and Jaro/JW known
values."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.functions.similarity import (
    _jaro,
    _jaro_winkler,
    sim_exact,
    sim_gauss,
    sim_jaccard_tokens,
    sim_jaro_winkler,
    sim_levenshtein,
    sim_cosine_arrays,
)


def test_jaro_known_values():
    # canonical textbook values
    assert _jaro("martha", "marhta") == pytest.approx(0.9444444, abs=1e-6)
    assert _jaro("dixon", "dicksonx") == pytest.approx(0.7666667, abs=1e-6)
    assert _jaro("", "") == 1.0
    assert _jaro("a", "") == 0.0
    assert _jaro("abc", "abc") == 1.0
    assert _jaro("abc", "xyz") == 0.0


def test_jaro_winkler_known_values():
    assert _jaro_winkler("martha", "marhta") == pytest.approx(0.9611111, abs=1e-6)
    assert _jaro_winkler("dixon", "dicksonx") == pytest.approx(0.8133333, abs=1e-6)
    # below 0.7 boost threshold → no prefix boost
    j = _jaro("fly", "ant")
    assert _jaro_winkler("fly", "ant") == j


def test_jaro_batch_matches_scalar_property():
    """The vectorized batch kernel must be bit-identical to the scalar
    reference on every row — including nulls, empties, unicode, equal
    strings, and the long-string fallback path."""
    from hypothesis import given, settings, strategies as st

    from idd_hw6_record_linkage_spark.functions.similarity import _jaro_batch

    pair = st.tuples(
        st.one_of(st.none(), st.text(alphabet="abcdε ", max_size=20)),
        st.one_of(st.none(), st.text(alphabet="abcdε ", max_size=20)),
    )

    @settings(max_examples=200, deadline=None)
    @given(st.lists(pair, min_size=1, max_size=50))
    def check(pairs):
        s1 = [p[0] for p in pairs]
        s2 = [p[1] for p in pairs]
        for winkler in (False, True):
            got = _jaro_batch(s1, s2, winkler=winkler)
            ref = _jaro_winkler if winkler else _jaro
            for i, (a, b) in enumerate(pairs):
                exp = 0.0 if (a is None or b is None) else ref(a, b)
                assert got[i] == exp, (winkler, a, b, got[i], exp)

    check()


def test_jaro_batch_long_string_fallback():
    from idd_hw6_record_linkage_spark.functions.similarity import _jaro_batch

    a, b = "ab" * 400, "ab" * 399 + "ba"  # > _VEC_MAX_LEN → scalar path
    got = _jaro_batch([a, b, a], [b, a, a], winkler=True)
    assert got[0] == _jaro_winkler(a, b)
    assert got[2] == 1.0


def test_native_comparators(spark):
    df = spark.createDataFrame(
        [
            (0, "kitten", "sitting", 100.0, 110.0, "a b c", "b c d"),
            (1, "same", "same", 5000.0, 0.0, "x", "x"),
            (2, None, "x", None, 1.0, None, "y"),
        ],
        "i int, s1 string, s2 string, n1 double, n2 double, t1 string, t2 string",
    )
    rows = {
        r["i"]: r
        for r in df.select(
            "i",
            sim_levenshtein("s1", "s2").alias("lev"),
            sim_exact("s1", "s2").alias("ex"),
            sim_gauss("n1", "n2", scale=10.0).alias("g"),
            sim_jaccard_tokens("t1", "t2").alias("j"),
        ).collect()
    }
    assert rows[0]["lev"] == pytest.approx(1 - 3 / 7)
    assert rows[0]["ex"] == 0.0
    assert rows[0]["g"] == pytest.approx(2.0 ** (-1.0))  # d/scale = 1
    assert rows[0]["j"] == pytest.approx(2 / 4)
    assert rows[1]["lev"] == 1.0 and rows[1]["ex"] == 1.0
    assert rows[1]["g"] == pytest.approx(2.0 ** (-(500.0**2)), abs=1e-12)
    assert rows[2]["lev"] == 0.0 and rows[2]["ex"] == 0.0
    assert rows[2]["g"] == 0.0 and rows[2]["j"] == 0.0


def test_jaro_winkler_udf(spark):
    df = spark.createDataFrame(
        [(0, "martha", "marhta"), (1, None, "x"), (2, "abc", "abc")],
        "i int, s1 string, s2 string",
    )
    rows = {
        r["i"]: r["jw"]
        for r in df.select("i", sim_jaro_winkler("s1", "s2").alias("jw")).collect()
    }
    assert rows[0] == pytest.approx(0.9611111, abs=1e-6)
    assert rows[1] == 0.0
    assert rows[2] == 1.0


def test_cosine_arrays(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0], [0.0, 1.0]), (1, [1.0, 2.0], [2.0, 4.0]),
         (2, [0.0, 0.0], [1.0, 1.0])],
        "i int, v1 array<double>, v2 array<double>",
    )
    rows = {
        r["i"]: r["c"]
        for r in df.select("i", sim_cosine_arrays("v1", "v2").alias("c")).collect()
    }
    assert rows[0] == pytest.approx(0.0)
    assert rows[1] == pytest.approx(1.0)
    assert rows[2] == 0.0
