"""Exact set-similarity join (operators/setsim_join.py): brute-force
all-pairs parity (the prefix filter must lose NOTHING — exactness is
the operator's contract), integer threshold semantics at the boundary,
empty/degenerate token sets, native plan (no Python eval, no
cartesian)."""

from __future__ import annotations

import pytest


def _brute(rows, num, den):
    sets = {rid: {t for t in toks if t} for rid, toks in rows}
    ids = sorted(sets)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if not sets[a] or not sets[b]:
                continue
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if inter * den >= union * num:
                out[(a, b)] = (inter, union, round(inter / union, 6))
    return out


def _run(spark, rows, num, den):
    from idd_hw6_record_linkage_spark.operators.setsim_join import (
        jaccard_setsim_join,
    )

    df = spark.createDataFrame(rows, "id string, toks array<string>")
    got = jaccard_setsim_join(df, "id", "toks", num, den).collect()
    return {
        (min(r.id_l, r.id_r), max(r.id_l, r.id_r)): (
            r.n_common,
            r.n_union,
            r.jac,
        )
        for r in got
    }


class TestJaccardSetsimJoin:
    def test_matches_brute_force(self, spark):
        rows = [
            ("a", ["the", "quick", "brown", "fox", "jumps"]),
            ("b", ["the", "quick", "brown", "fox", "leaps"]),  # jac 4/6
            ("c", ["quick", "brown", "fox", "jumps", "the"]),  # == a
            ("d", ["совершенно", "other", "tokens", "here"]),
            ("e", []),
            ("f", ["the"]),  # tiny set: shares only the hottest token
            ("g", ["the", "quick", "brown", "fox", "jumps", "extra"]),
        ]
        for num, den in [(1, 2), (6, 10), (9, 10), (1, 1)]:
            assert _run(spark, rows, num, den) == _brute(rows, num, den), (
                num,
                den,
            )

    def test_exact_boundary_is_integer(self, spark):
        # jac exactly 3/5: sets of size 4 sharing 3 (union 5).
        rows = [("a", ["x", "y", "z", "p"]), ("b", ["x", "y", "z", "q"])]
        assert ("a", "b") in _run(spark, rows, 3, 5)  # 3/5 >= 3/5
        assert ("a", "b") in _run(spark, rows, 6, 10)  # same rational
        assert _run(spark, rows, 61, 100) == {}  # 3/5 < 61/100

    def test_duplicate_and_empty_tokens_ignored(self, spark):
        # duplicates collapse (set semantics); '' and NULL drop
        rows = [
            ("a", ["x", "x", "y", ""]),
            ("b", ["y", "x", None, "x"]),
        ]
        got = _run(spark, rows, 1, 1)
        assert got == {("a", "b"): (2, 2, 1.0)}

    def test_threshold_validation(self, spark):
        from idd_hw6_record_linkage_spark.operators.setsim_join import (
            jaccard_setsim_join,
        )

        df = spark.createDataFrame([("a", ["x"])], "id string, toks array<string>")
        with pytest.raises(ValueError):
            jaccard_setsim_join(df, "id", "toks", 0, 10)
        with pytest.raises(ValueError):
            jaccard_setsim_join(df, "id", "toks", 11, 10)

    def test_plan_native_no_cartesian(self, spark):
        from idd_hw6_record_linkage_spark.operators.setsim_join import (
            jaccard_setsim_join,
        )

        df = spark.createDataFrame(
            [("a", ["x", "y"]), ("b", ["y", "z"])],
            "id string, toks array<string>",
        )
        out = jaccard_setsim_join(df, "id", "toks", 1, 2)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan

    def test_randomized_parity(self, spark):
        # 60 records over a 12-token vocabulary — dense overlap, so
        # every pruning branch (prefix miss, length filter, verify
        # reject) is exercised; exactness means brute == pruned.
        import random

        rng = random.Random(42)
        vocab = [f"t{i}" for i in range(12)]
        rows = [
            (f"r{i:02d}", rng.sample(vocab, rng.randint(1, 8)))
            for i in range(60)
        ]
        for num, den in [(1, 2), (7, 10)]:
            assert _run(spark, rows, num, den) == _brute(rows, num, den)
