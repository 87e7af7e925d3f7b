"""PassJoin exact edit-distance self-join (operators/edit_join).

Pinned against a brute-force all-pairs Levenshtein at several
thresholds on randomized typo corpora (the same no-false-negatives
property the rl_edit_join contract oracle checks value-exactly), plus
the segment-scheme arithmetic, short-key contract, d=0 degeneration to
exact equality, and a no-cartesian plan assert.
"""

import random

import pytest
from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.operators.edit_join import (
    edit_distance_self_join,
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


def _brute(rows: list[tuple[int, str]], d: int) -> set[tuple[int, int, int]]:
    out = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            (ia, a), (ib, b) = rows[i], rows[j]
            if len(a) < d + 1 or len(b) < d + 1:
                continue
            lv = _lev(a, b)
            if lv <= d:
                lo, hi = min(ia, ib), max(ia, ib)
                out.add((lo, hi, lv))
    return out


def _typo_corpus(n_bases: int, seed: int) -> list[tuple[int, str]]:
    """Base strings plus 1-3-edit corruptions — guarantees true pairs
    at every threshold."""
    rng = random.Random(seed)
    al = "abcdef gh"
    rows = []
    rid = 0
    for _ in range(n_bases):
        base = "".join(rng.choice(al) for _ in range(rng.randint(4, 16)))
        rows.append((rid, base))
        rid += 1
        for _ in range(rng.randint(0, 2)):
            s = list(base)
            for _ in range(rng.randint(1, 3)):
                op = rng.choice("sid")
                p = rng.randrange(max(len(s), 1))
                if op == "s" and s:
                    s[p] = rng.choice(al)
                elif op == "i":
                    s.insert(p, rng.choice(al))
                elif op == "d" and len(s) > 1:
                    del s[p]
            rows.append((rid, "".join(s)))
            rid += 1
    return rows


def _run(spark, rows, d):
    df = spark.createDataFrame(rows, ["id", "s"])
    got = edit_distance_self_join(df, "id", "s", d=d).collect()
    pairs = {(r["id_l"], r["id_r"], r["lev"]) for r in got}
    assert len(pairs) == len(got), "duplicate pairs emitted"
    return pairs


class TestBruteParity:
    @pytest.mark.parametrize("d", [1, 2, 3])
    def test_typo_corpus(self, spark, d):
        rows = _typo_corpus(40, seed=100 + d)
        assert _run(spark, rows, d) == _brute(rows, d)

    def test_dense_short_alphabet(self, spark):
        # tiny alphabet -> many accidental near-pairs, stresses both
        # pruning (false positives must die in verify) and completeness
        rng = random.Random(9)
        rows = [
            (i, "".join(rng.choice("ab") for _ in range(rng.randint(3, 8))))
            for i in range(60)
        ]
        for d in (1, 2):
            assert _run(spark, rows, d) == _brute(rows, d)

    def test_d0_is_exact_equality(self, spark):
        rows = [(0, "abc"), (1, "abc"), (2, "abd"), (3, "abc")]
        assert _run(spark, rows, 0) == {(0, 1, 0), (0, 3, 0), (1, 3, 0)}


class TestContract:
    def test_short_keys_excluded(self, spark):
        # keys shorter than d+1 are out of contract (documented)
        rows = [(0, "ab"), (1, "ab"), (2, "abcd"), (3, "abce")]
        assert _run(spark, rows, 2) == {(2, 3, 1)}

    def test_nulls_dropped(self, spark):
        rows = [(0, None), (1, "abcd"), (2, "abcd")]
        df = spark.createDataFrame(rows, ["id", "s"])
        got = edit_distance_self_join(df, "id", "s", d=1).collect()
        assert {(r["id_l"], r["id_r"]) for r in got} == {(1, 2)}

    def test_negative_d_rejected(self):
        with pytest.raises(ValueError):
            edit_distance_self_join(None, "id", "s", d=-1)

    def test_length_filter_boundary(self, spark):
        # |len diff| == d is reachable, > d never pairs
        rows = [(0, "aaaa"), (1, "aaaaaa"), (2, "aaaaaaa")]
        assert _run(spark, rows, 2) == {(0, 1, 2), (1, 2, 1)}


class TestPlan:
    def test_no_cartesian(self, spark):
        df = spark.createDataFrame([(0, "abcd")], ["id", "s"])
        plan = (
            edit_distance_self_join(df, "id", "s", d=2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan  # fully native
