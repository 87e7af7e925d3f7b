"""Bag-distance comparator (functions/bag).

Pins: naive Python multiset recomputation parity, the Bartolini
lower-bound theorem bag ≤ levenshtein on randomized pairs (the property
that makes bag a sound filter-and-verify prune), NULL/empty
conventions, and plan hygiene (pure native expressions — no Python of
any kind in the plan)."""

import random
from collections import Counter

from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.functions.bag import (
    bag_distance,
    bag_distance_fixed_alphabet,
    sim_bag,
)


def _bag_naive(a: str, b: str) -> int:
    ca, cb = Counter(a), Counter(b)
    d1 = sum((ca - cb).values())
    d2 = sum((cb - ca).values())
    return max(d1, d2)


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
    alpha = "abcde 012"
    out = []
    for _ in range(n):
        la, lb = rng.randint(0, 20), rng.randint(0, 20)
        a = "".join(rng.choice(alpha) for _ in range(la))
        b = "".join(rng.choice(alpha) for _ in range(lb))
        out.append((a, b))
    return out


def test_naive_parity_and_lower_bound(spark):
    pairs = _rand_pairs(300, 3) + [
        ("", ""),
        ("abc", ""),
        ("", "zz"),
        ("listen", "silent"),  # anagram: bag 0, lev > 0
        ("aabbb", "ab"),
    ]
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)], ["i", "a", "b"]
    ).repartition(4)
    got = {
        r["i"]: (r["bag"], r["lev"])
        for r in df.select(
            "i",
            bag_distance("a", "b").alias("bag"),
            F.levenshtein("a", "b").alias("lev"),
        ).collect()
    }
    for i, (a, b) in enumerate(pairs):
        bag, lev = got[i]
        assert bag == _bag_naive(a, b), (a, b)
        assert lev == _lev(a, b), (a, b)
        assert bag <= lev, (a, b)  # the filter-and-verify theorem


def test_fixed_alphabet_equals_generic(spark):
    """The codegen fixed-alphabet form (used by the contract query on
    its sanitized [a-z0-9 ] basis) must equal the generic HOF multiset
    form on every in-alphabet input, including empties and NULLs."""
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789 "
    rng = random.Random(11)
    pairs = [
        (
            "".join(rng.choice(alpha) for _ in range(rng.randint(0, 40))),
            "".join(rng.choice(alpha) for _ in range(rng.randint(0, 40))),
        )
        for _ in range(300)
    ] + [("", ""), ("abc", ""), ("", "0 9"), ("listen", "silent")]
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)], ["i", "a", "b"]
    ).repartition(4)
    rows = df.select(
        "i",
        bag_distance("a", "b").alias("generic"),
        bag_distance_fixed_alphabet("a", "b", alpha).alias("fixed"),
    ).collect()
    for r in rows:
        assert r["generic"] == r["fixed"], pairs[r["i"]]
    # NULL-as-empty convention matches too
    nrow = (
        spark.createDataFrame([(None, "ab")], "a string, b string")
        .select(
            bag_distance("a", "b").alias("g"),
            bag_distance_fixed_alphabet("a", "b", alpha).alias("f"),
        )
        .collect()[0]
    )
    assert nrow["g"] == nrow["f"] == 2


def test_null_and_sim_conventions(spark):
    df = spark.createDataFrame(
        [("x", None, "abc"), ("y", None, None), ("z", "ab", "ab")],
        ["id", "a", "b"],
    )
    got = {
        r["id"]: (r["bag"], r["sim"])
        for r in df.select(
            "id",
            bag_distance("a", "b").alias("bag"),
            sim_bag("a", "b").alias("sim"),
        ).collect()
    }
    assert got["x"][0] == 3  # NULL-as-empty vs 'abc'
    assert got["y"][0] == 0 and got["y"][1] == 1.0
    assert got["z"] == (0, 1.0)


def test_plan_is_fully_native(spark):
    df = spark.createDataFrame([("aa", "ab")], ["a", "b"])
    plan = df.select(
        bag_distance("a", "b")
    )._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
