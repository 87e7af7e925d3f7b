"""B-cubed cluster evaluation (operators/evaluation.py): textbook
per-record recomputation parity, perfect-clustering identity,
coverage-mismatch exclusion."""

from __future__ import annotations

import pytest




class TestBCubed:
    """bcubed vs the textbook per-record computation."""

    def _naive(self, pred, truth):
        c = dict(pred)
        t = dict(truth)
        ids = [i for i in c if i in t]
        by_c, by_t = {}, {}
        for i in ids:
            by_c.setdefault(c[i], set()).add(i)
            by_t.setdefault(t[i], set()).add(i)
        p = sum(
            len(by_c[c[i]] & by_t[t[i]]) / len(by_c[c[i]]) for i in ids
        ) / len(ids)
        r = sum(
            len(by_c[c[i]] & by_t[t[i]]) / len(by_t[t[i]]) for i in ids
        ) / len(ids)
        return p, r, 2 * p * r / (p + r)

    def test_matches_naive(self, spark):
        from idd_hw6_record_linkage_spark.operators.evaluation import bcubed

        # truth: {a,b,c} {d,e} {f}; pred splits the first and merges
        # the second into the third.
        pred = [("a", "p1"), ("b", "p1"), ("c", "p2"),
                ("d", "p3"), ("e", "p3"), ("f", "p3")]
        truth = [("a", "t1"), ("b", "t1"), ("c", "t1"),
                 ("d", "t2"), ("e", "t2"), ("f", "t3")]
        out = bcubed(
            spark.createDataFrame(pred, "url string, entity_id string"),
            spark.createDataFrame(truth, "url string, truth_id string"),
        ).collect()[0]
        p, r, f1 = self._naive(pred, truth)
        assert out["n_records"] == 6
        assert out["bcubed_precision"] == pytest.approx(p, abs=1e-6)
        assert out["bcubed_recall"] == pytest.approx(r, abs=1e-6)
        assert out["bcubed_f1"] == pytest.approx(f1, abs=1e-6)

    def test_perfect_clustering_scores_one(self, spark):
        from idd_hw6_record_linkage_spark.operators.evaluation import bcubed

        rows = [("a", "x"), ("b", "x"), ("c", "y")]
        out = bcubed(
            spark.createDataFrame(rows, "url string, entity_id string"),
            spark.createDataFrame(rows, "url string, truth_id string"),
        ).collect()[0]
        assert out["bcubed_precision"] == 1.0
        assert out["bcubed_recall"] == 1.0
        assert out["bcubed_f1"] == 1.0

    def test_uncovered_records_excluded(self, spark):
        from idd_hw6_record_linkage_spark.operators.evaluation import bcubed

        pred = [("a", "p"), ("b", "p"), ("zzz", "p")]
        truth = [("a", "t"), ("b", "t")]
        out = bcubed(
            spark.createDataFrame(pred, "url string, entity_id string"),
            spark.createDataFrame(truth, "url string, truth_id string"),
        ).collect()[0]
        assert out["n_records"] == 2
        # within the covered set the clustering is perfect
        assert out["bcubed_f1"] == 1.0


class TestThresholdSweep:
    def test_hand_computed_curve(self, spark):
        from idd_hw6_record_linkage_spark.operators.evaluation import (
            threshold_sweep,
        )

        scored = spark.createDataFrame(
            [
                ("a", "b", 0.9),  # true
                ("c", "d", 0.6),  # false
                ("e", "f", 0.4),  # true
                ("g", "h", 0.2),  # false
            ],
            "id_l string, id_r string, score double",
        )
        truth = spark.createDataFrame(
            # (i,j) never scored: a blocking miss -> permanent FN
            [("a", "b"), ("e", "f"), ("i", "j")],
            "id_l string, id_r string",
        )
        out = {
            r["threshold"]: r
            for r in threshold_sweep(scored, truth, [0.5, 0.3]).collect()
        }
        lo, hi = out[0.3], out[0.5]
        # >= 0.3 predicts {0.9 T, 0.6 F, 0.4 T}; >= 0.5 predicts
        # {0.9 T, 0.6 F}; (i,j) is always a miss.
        assert (lo["tp"], lo["fp"], lo["fn"]) == (2, 1, 1)
        assert lo["precision"] == pytest.approx(2 / 3, abs=1e-6)
        assert lo["recall"] == pytest.approx(2 / 3, abs=1e-6)
        assert (hi["tp"], hi["fp"], hi["fn"]) == (1, 1, 2)
        assert hi["precision"] == 0.5
        assert hi["recall"] == pytest.approx(1 / 3, abs=1e-6)
        f1 = lambda p, r: 2 * p * r / (p + r)
        assert lo["f1"] == pytest.approx(2 / 3, abs=1e-6)
        assert hi["f1"] == pytest.approx(f1(0.5, 1 / 3), abs=1e-6)

    def test_degenerate_thresholds(self, spark):
        from idd_hw6_record_linkage_spark.operators.evaluation import (
            threshold_sweep,
        )

        scored = spark.createDataFrame(
            [("a", "b", 0.9)], "id_l string, id_r string, score double"
        )
        truth = spark.createDataFrame(
            [("a", "b")], "id_l string, id_r string"
        )
        out = {
            r["threshold"]: r
            for r in threshold_sweep(scored, truth, [0.0, 1.0]).collect()
        }
        assert out[0.0]["f1"] == 1.0
        assert out[1.0]["tp"] == 0 and out[1.0]["precision"] == 0.0
        with pytest.raises(ValueError, match="non-empty"):
            threshold_sweep(scored, truth, [])
