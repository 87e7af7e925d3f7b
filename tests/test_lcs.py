"""Longest-common-substring comparator (functions/lcs).

Pins: naive Python DP recomputation parity on randomized pairs and
adversarial hand cases (token swaps where LCS diverges hardest from
the edit family), side symmetry (windows come from the shorter input
but the result must not depend on argument order), NULL/empty
conventions, the lcs <= min(len) bound, and plan hygiene (pure native
higher-order functions — no Python of any kind in the plan)."""

import random

from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.functions.lcs import lcs_len, sim_lcs


def _lcs_naive(a: str, b: str) -> int:
    """Classic O(|a|*|b|) suffix-table DP."""
    best = 0
    prev = [0] * (len(b) + 1)
    for i in range(1, len(a) + 1):
        cur = [0] * (len(b) + 1)
        for j in range(1, len(b) + 1):
            if a[i - 1] == b[j - 1]:
                cur[j] = prev[j - 1] + 1
                best = max(best, cur[j])
        prev = cur
    return best


def _rand_pairs(n: int, seed: int) -> list[tuple[str, str]]:
    rng = random.Random(seed)
    alpha = "abc 01"  # small alphabet forces long accidental runs
    out = []
    for _ in range(n):
        la, lb = rng.randint(0, 18), rng.randint(0, 18)
        a = "".join(rng.choice(alpha) for _ in range(la))
        b = "".join(rng.choice(alpha) for _ in range(lb))
        out.append((a, b))
    return out


def test_naive_parity_and_bounds(spark):
    pairs = _rand_pairs(250, 11) + [
        ("", ""),
        ("abc", ""),
        ("", "zz"),
        ("john smith", "smith john"),  # token swap: 'smith' survives
        ("abcdef", "abcdef"),
        ("abcdef", "zabcdez"),
        ("aaaa", "aa"),
        ("xyz", "abc"),  # disjoint alphabets: 0
    ]
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)], ["i", "a", "b"]
    ).repartition(4)
    got = {
        r["i"]: (r["lcs"], r["rev"], r["sim"])
        for r in df.select(
            "i",
            lcs_len("a", "b").alias("lcs"),
            lcs_len("b", "a").alias("rev"),
            sim_lcs("a", "b").alias("sim"),
        ).collect()
    }
    for i, (a, b) in enumerate(pairs):
        lcs, rev, sim = got[i]
        want = _lcs_naive(a, b)
        assert lcs == want, (a, b, lcs, want)
        assert rev == lcs, (a, b)  # side symmetry
        assert lcs <= min(len(a), len(b)), (a, b)
        assert sim == lcs / max(len(a), len(b), 1), (a, b)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        cur = [i] + [0] * len(b)
        for j in range(1, len(b) + 1):
            cur[j] = min(
                prev[j - 1] + (a[i - 1] != b[j - 1]),
                prev[j] + 1,
                cur[j - 1] + 1,
            )
        prev = cur
    return prev[len(b)]


def test_adversarial_vs_edit_family(spark):
    # The operator's reason to exist: a wholesale token move keeps a
    # long common substring while Levenshtein charges nearly the full
    # length — and scattered typos do the opposite.
    cases = [("john smith", "smith john"), ("abcdefgh", "axcxexgx")]
    df = spark.createDataFrame(cases, ["a", "b"])
    rows = (
        df.select(
            "a",
            "b",
            lcs_len("a", "b").alias("lcs"),
            F.levenshtein("a", "b").alias("lev"),
        )
        .orderBy("a")
        .collect()
    )
    typos, swap = rows[0], rows[1]
    assert swap["lev"] == _lev(*cases[0])
    assert swap["lcs"] == 5  # 'smith' survives the move
    assert swap["lev"] > swap["lcs"]  # edit family sees a rewrite
    assert typos["lcs"] == 1  # no run survives alternating typos
    assert typos["lev"] == 4


def test_null_and_sim_conventions(spark):
    df = spark.createDataFrame(
        [("x", None, "abc"), ("y", None, None), ("z", "ab", "ab")],
        ["id", "a", "b"],
    )
    got = {
        r["id"]: (r["lcs"], r["sim"])
        for r in df.select(
            "id",
            lcs_len("a", "b").alias("lcs"),
            sim_lcs("a", "b").alias("sim"),
        ).collect()
    }
    assert got["x"] == (0, 0.0)  # NULL-as-empty vs 'abc'
    assert got["y"] == (0, 0.0)  # both empty -> 0.0 by convention
    assert got["z"] == (2, 1.0)


def test_plan_is_fully_native(spark):
    df = spark.createDataFrame([("aa", "ab")], ["a", "b"])
    plan = df.select(
        lcs_len("a", "b")
    )._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
