"""Needleman-Wunsch global-alignment comparator (functions/needleman).

The vectorized kernel is pinned three ways: randomized parity against
the textbook scalar DP at the default scoring, exact equality with an
independent Levenshtein DP at the unit-cost point (the same identity
the rl_nw_unit contract oracle checks against DuckDB), and closed-form
invariants (equal → 1.0, prefix pairs score m·|a| − g·(|b|−|a|)).
Plan hygiene: the UDF must compile to ArrowEvalPython, never
BatchEvalPython."""

import random

import pytest
from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.functions.needleman import (
    _nw_batch,
    _nw_scalar,
    nw_unit_distance,
    sim_needleman_wunsch,
)


def _lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j - 1] + (a[i - 1] != b[j - 1]),
                prev[j] + 1,
                cur[j - 1] + 1,
            )
        prev = cur
    return prev[lb]


def _rand_pairs(n: int, seed: int) -> list[tuple[str, str]]:
    rng = random.Random(seed)
    alpha = "abcdef xyz012"
    out = []
    for _ in range(n):
        la, lb = rng.randint(0, 24), rng.randint(0, 28)
        a = "".join(rng.choice(alpha) for _ in range(la))
        b = "".join(rng.choice(alpha) for _ in range(lb))
        if rng.random() < 0.3:  # bias toward related strings
            b = a[: rng.randint(0, la)] + b[:6]
        out.append((a, b))
    return out


def test_unit_point_equals_levenshtein():
    pairs = _rand_pairs(800, 7) + [
        ("", ""),
        ("abc", ""),
        ("", "xy"),
        ("same", "same"),
        ("kitten", "sitting"),
    ]
    raw = _nw_batch(
        [p[0] for p in pairs], [p[1] for p in pairs], 0.0, -1.0, 1.0
    )
    for (a, b), r in zip(pairs, raw):
        assert int(round(-r)) == _lev(a, b), (a, b)


def test_default_params_match_scalar_dp():
    pairs = [
        (a, b) for a, b in _rand_pairs(400, 11) if a and b and a != b
    ]
    raw = _nw_batch([p[0] for p in pairs], [p[1] for p in pairs])
    for (a, b), r in zip(pairs, raw):
        assert r == _nw_scalar(a, b), (a, b)


def test_prefix_invariant_and_conventions():
    # a prefix of b: optimal alignment matches all of a and pays one
    # gap per extra char of b -> raw = 1.0*|a| - 1.0*(|b|-|a|).
    raw = _nw_batch(["align", "align"], ["alignment", "align"])
    assert raw[0] == pytest.approx(5.0 - 4.0)
    assert raw[1] == pytest.approx(5.0)
    # None treated as '' at the raw level
    raw2 = _nw_batch([None, "abc"], ["xy", None], 0.0, -1.0, 1.0)
    assert -raw2[0] == 2 and -raw2[1] == 3


def test_spark_columns_and_plan(spark):
    rows = [
        ("a", "needleman", "needle"),
        ("b", "wunsch", "wunsch"),
        ("c", None, "x"),
        ("d", "", ""),
        ("e", "abc", "xyz"),
    ]
    df = spark.createDataFrame(rows, ["id", "s1", "s2"]).repartition(2)
    got = {
        r["id"]: (r["dist"], r["sim"])
        for r in df.select(
            "id",
            nw_unit_distance("s1", "s2").alias("dist"),
            sim_needleman_wunsch("s1", "s2").alias("sim"),
        ).collect()
    }
    assert got["a"][0] == _lev("needleman", "needle")
    assert got["b"] == (0, 1.0)
    assert got["c"][0] == 1 and got["c"][1] == 0.0  # NULL -> '' / 0.0
    assert got["d"] == (0, 1.0)  # both-empty equal -> 1.0
    assert got["e"][0] == 3
    plan = df.select(
        nw_unit_distance("s1", "s2")
    )._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_long_string_fallback():
    a = "q" * 600 + "hello"
    b = "q" * 600 + "hallo"
    raw = _nw_batch([a], [b], 0.0, -1.0, 1.0)
    assert int(round(-raw[0])) == 1
