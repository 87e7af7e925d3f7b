"""MUC link-based cluster score (operators/evaluation.py muc_score):
textbook per-cluster link-count recomputation parity, perfect- and
degenerate-clustering identities, singleton blindness."""

from __future__ import annotations

import pytest


def _naive_muc(pred, truth):
    """Vilain et al. 1995 textbook form: per truth cluster t,
    recall contribution (|t| − |partition of t by pred|); precision is
    the same with roles swapped."""
    c = dict(pred)
    t = dict(truth)
    ids = [i for i in c if i in t]
    by_c, by_t = {}, {}
    for i in ids:
        by_c.setdefault(c[i], []).append(i)
        by_t.setdefault(t[i], []).append(i)

    def side(key_of, groups):
        num = sum(
            len(g) - len({key_of[i] for i in g}) for g in groups.values()
        )
        den = sum(len(g) - 1 for g in groups.values())
        return (num / den) if den > 0 else 1.0

    r = side(c, by_t)
    p = side(t, by_c)
    f1 = 2 * p * r / (p + r) if p + r > 0 else 0.0
    return p, r, f1


class TestMuc:
    def test_matches_naive(self, spark):
        from idd_hw6_record_linkage_spark.operators.evaluation import (
            muc_score,
        )

        # truth: {a,b,c} {d,e} {f}; pred splits the first and merges
        # the second into the third (same fixture as the B³ test).
        pred = [("a", "p1"), ("b", "p1"), ("c", "p2"),
                ("d", "p3"), ("e", "p3"), ("f", "p3")]
        truth = [("a", "t1"), ("b", "t1"), ("c", "t1"),
                 ("d", "t2"), ("e", "t2"), ("f", "t3")]
        out = muc_score(
            spark.createDataFrame(pred, "url string, entity_id string"),
            spark.createDataFrame(truth, "url string, truth_id string"),
        ).collect()[0]
        p, r, f1 = _naive_muc(pred, truth)
        assert out["n_records"] == 6
        assert out["n_overlap_cells"] == 4
        assert out["muc_precision"] == pytest.approx(p, abs=1e-6)
        assert out["muc_recall"] == pytest.approx(r, abs=1e-6)
        assert out["muc_f1"] == pytest.approx(f1, abs=1e-6)

    def test_perfect_clustering_scores_one(self, spark):
        from idd_hw6_record_linkage_spark.operators.evaluation import (
            muc_score,
        )

        pred = [("a", "x"), ("b", "x"), ("c", "y")]
        truth = [("a", "t"), ("b", "t"), ("c", "u")]
        out = muc_score(
            spark.createDataFrame(pred, "url string, entity_id string"),
            spark.createDataFrame(truth, "url string, truth_id string"),
        ).collect()[0]
        assert out["muc_precision"] == 1.0
        assert out["muc_recall"] == 1.0
        assert out["muc_f1"] == 1.0

    def test_all_singletons_convention(self, spark):
        from idd_hw6_record_linkage_spark.operators.evaluation import (
            muc_score,
        )

        # Both sides all-singletons: no links exist on either side —
        # denominators are 0 and both sides read 1.0 by convention.
        pred = [("a", "p1"), ("b", "p2")]
        truth = [("a", "t1"), ("b", "t2")]
        out = muc_score(
            spark.createDataFrame(pred, "url string, entity_id string"),
            spark.createDataFrame(truth, "url string, truth_id string"),
        ).collect()[0]
        assert out["muc_precision"] == 1.0
        assert out["muc_recall"] == 1.0

    def test_singleton_blindness(self, spark):
        """MUC's documented blind spot: adding correctly-placed
        singletons changes nothing (they carry no links)."""
        from idd_hw6_record_linkage_spark.operators.evaluation import (
            muc_score,
        )

        base_pred = [("a", "p1"), ("b", "p1"), ("c", "p2"), ("d", "p2")]
        base_truth = [("a", "t1"), ("b", "t1"), ("c", "t1"), ("d", "t2")]
        extra_pred = base_pred + [("x", "px"), ("y", "py")]
        extra_truth = base_truth + [("x", "tx"), ("y", "ty")]
        m1 = muc_score(
            spark.createDataFrame(base_pred, "url string, entity_id string"),
            spark.createDataFrame(base_truth, "url string, truth_id string"),
        ).collect()[0]
        m2 = muc_score(
            spark.createDataFrame(extra_pred, "url string, entity_id string"),
            spark.createDataFrame(extra_truth, "url string, truth_id string"),
        ).collect()[0]
        assert m1["muc_precision"] == m2["muc_precision"]
        assert m1["muc_recall"] == m2["muc_recall"]

    def test_one_big_merge_costs_one_link(self, spark):
        """Merging two truth entities of size 3 into one pred cluster:
        recall stays 1.0, precision loses exactly one link of five."""
        from idd_hw6_record_linkage_spark.operators.evaluation import (
            muc_score,
        )

        pred = [(i, "p") for i in "abcdef"]
        truth = [("a", "t1"), ("b", "t1"), ("c", "t1"),
                 ("d", "t2"), ("e", "t2"), ("f", "t2")]
        out = muc_score(
            spark.createDataFrame(pred, "url string, entity_id string"),
            spark.createDataFrame(truth, "url string, truth_id string"),
        ).collect()[0]
        assert out["muc_recall"] == 1.0
        assert out["muc_precision"] == pytest.approx(4 / 5, abs=1e-6)


def _naive_gmd(pred, truth):
    """Menestrina VLDB'10 closed form recomputed from raw partitions:
    split every mixed pred cluster into contingency cells, merge cells
    per truth cluster."""
    c, t = dict(pred), dict(truth)
    ids = [i for i in c if i in t]
    cells = {(c[i], t[i]) for i in ids}
    kp = len({c[i] for i in ids})
    kt = len({t[i] for i in ids})
    return len(cells) - kp, len(cells) - kt


class TestGeneralizedMergeDistance:
    def _run(self, spark, pred, truth):
        from idd_hw6_record_linkage_spark.operators.evaluation import (
            generalized_merge_distance,
        )

        return generalized_merge_distance(
            spark.createDataFrame(pred, "url string, entity_id string"),
            spark.createDataFrame(truth, "url string, truth_id string"),
        ).collect()[0]

    def test_matches_naive(self, spark):
        pred = [("a", "p1"), ("b", "p1"), ("c", "p2"),
                ("d", "p3"), ("e", "p3"), ("f", "p3")]
        truth = [("a", "t1"), ("b", "t1"), ("c", "t1"),
                 ("d", "t2"), ("e", "t2"), ("f", "t3")]
        out = self._run(spark, pred, truth)
        s, m = _naive_gmd(pred, truth)
        assert (out["gmd_splits"], out["gmd_merges"]) == (s, m)
        assert out["gmd"] == s + m
        # by hand: cells = {(p1,t1),(p2,t1),(p3,t2),(p3,t3)} -> nnz 4,
        # splits 4-3=1 (p3 is mixed), merges 4-3=1 (t1 is split)
        assert out["gmd"] == 2

    def test_identical_partitions_zero(self, spark):
        rows = [("a", "x"), ("b", "x"), ("c", "y")]
        out = self._run(spark, rows, [(u, "t" + g) for u, g in rows])
        assert out["gmd"] == 0 and out["gmd_norm"] == 0.0

    def test_singletons_vs_one_cluster(self, spark):
        n = 7
        pred = [(f"u{i}", f"p{i}") for i in range(n)]
        truth = [(f"u{i}", "t") for i in range(n)]
        out = self._run(spark, pred, truth)
        # no splits needed, n-1 merges; worst case == gmd -> norm 1.0
        assert (out["gmd_splits"], out["gmd_merges"]) == (0, n - 1)
        assert out["gmd_norm"] == 1.0

    def test_randomized_closed_form(self, spark):
        import random

        rng = random.Random(3)
        ids = [f"u{i}" for i in range(60)]
        pred = [(i, f"p{rng.randint(0, 9)}") for i in ids]
        truth = [(i, f"t{rng.randint(0, 6)}") for i in ids]
        out = self._run(spark, pred, truth)
        s, m = _naive_gmd(pred, truth)
        assert (out["gmd_splits"], out["gmd_merges"], out["gmd"]) == (
            s,
            m,
            s + m,
        )

    def test_all_singletons_both_sides(self, spark):
        pred = [("a", "p1"), ("b", "p2")]
        truth = [("a", "t1"), ("b", "t2")]
        out = self._run(spark, pred, truth)
        assert out["gmd"] == 0 and out["gmd_norm"] == 0.0
