"""Adjusted Rand Index, average precision, and triangle support
(operators/evaluation.py, operators/clustering.py): brute-force pair
enumeration parity, degenerate-input conventions, skew/orientation
invariance."""

from __future__ import annotations

import itertools
import random
from collections import defaultdict


class TestAdjustedRandIndex:
    def _brute(self, pred, truth):
        pm, tm = dict(pred), dict(truth)
        ids = [i for i in pm if i in tm]
        tp = tn = fp = fn = 0
        for a, b in itertools.combinations(ids, 2):
            sp, st = pm[a] == pm[b], tm[a] == tm[b]
            if sp and st:
                tp += 1
            elif not sp and not st:
                tn += 1
            elif sp:
                fp += 1
            else:
                fn += 1
        tot = tp + tn + fp + fn
        ri = (tp + tn) / tot
        ari = (
            2 * (tp * tn - fp * fn)
            / ((tp + fn) * (fn + tn) + (tp + fp) * (fp + tn))
        )
        return tp, ri, ari

    def test_matches_pairwise_brute_force(self, spark):
        from idd_hw6_record_linkage_spark.operators.evaluation import (
            adjusted_rand_index,
        )

        rng = random.Random(7)
        ids = [f"r{i}" for i in range(120)]
        pred = [(i, f"c{rng.randint(0, 12)}") for i in ids]
        truth = [(i, f"t{rng.randint(0, 9)}") for i in ids]
        row = adjusted_rand_index(
            spark.createDataFrame(pred, ["url", "entity_id"]),
            spark.createDataFrame(truth, ["url", "truth_id"]),
        ).collect()[0]
        tp, ri, ari = self._brute(pred, truth)
        assert row.n_records == 120
        assert row.pairs_both == tp
        assert abs(row.rand_index - ri) < 1e-6
        assert abs(row.adjusted_rand - ari) < 1e-6

    def test_identical_clusterings_score_one(self, spark):
        from idd_hw6_record_linkage_spark.operators.evaluation import (
            adjusted_rand_index,
        )

        rows = [("a", "x"), ("b", "x"), ("c", "y"), ("d", "z")]
        row = adjusted_rand_index(
            spark.createDataFrame(rows, ["url", "entity_id"]),
            spark.createDataFrame(rows, ["url", "truth_id"]),
        ).collect()[0]
        assert row.rand_index == 1.0
        assert row.adjusted_rand == 1.0

    def test_all_singletons_degenerate_is_one(self, spark):
        # ARI denominator is 0 when both sides are all-singletons;
        # the convention is 1.0 (trivially perfect agreement).
        from idd_hw6_record_linkage_spark.operators.evaluation import (
            adjusted_rand_index,
        )

        rows = [(f"r{i}", f"s{i}") for i in range(5)]
        row = adjusted_rand_index(
            spark.createDataFrame(rows, ["url", "entity_id"]),
            spark.createDataFrame(rows, ["url", "truth_id"]),
        ).collect()[0]
        assert row.adjusted_rand == 1.0

    def test_coverage_mismatch_excluded(self, spark):
        from idd_hw6_record_linkage_spark.operators.evaluation import (
            adjusted_rand_index,
        )

        pred = [("a", "x"), ("b", "x"), ("only_pred", "x")]
        truth = [("a", "x"), ("b", "x"), ("only_truth", "x")]
        row = adjusted_rand_index(
            spark.createDataFrame(pred, ["url", "entity_id"]),
            spark.createDataFrame(truth, ["url", "truth_id"]),
        ).collect()[0]
        assert row.n_records == 2


class TestClusterEntropyMetrics:
    def test_matches_textbook_formulas(self, spark):
        import math
        from collections import Counter

        from idd_hw6_record_linkage_spark.operators.evaluation import (
            cluster_entropy_metrics,
        )

        rng = random.Random(9)
        ids = [f"r{i}" for i in range(150)]
        pred = [(i, f"c{rng.randint(0, 10)}") for i in ids]
        truth = [(i, f"t{rng.randint(0, 8)}") for i in ids]
        row = cluster_entropy_metrics(
            spark.createDataFrame(pred, ["url", "entity_id"]),
            spark.createDataFrame(truth, ["url", "truth_id"]),
        ).collect()[0]
        pm, tm = dict(pred), dict(truth)
        n = len(ids)
        nct = Counter((pm[i], tm[i]) for i in ids)
        nc = Counter(pm[i] for i in ids)
        nt = Counter(tm[i] for i in ids)
        h_tc = -sum(v / n * math.log(v / nc[c]) for (c, t), v in nct.items())
        h_ct = -sum(v / n * math.log(v / nt[t]) for (c, t), v in nct.items())
        h_t = -sum(v / n * math.log(v / n) for v in nt.values())
        h_c = -sum(v / n * math.log(v / n) for v in nc.values())
        h = 1 - h_tc / h_t
        c = 1 - h_ct / h_c
        assert abs(row.homogeneity - h) < 1e-6
        assert abs(row.completeness - c) < 1e-6
        assert abs(row.v_measure - 2 * h * c / (h + c)) < 1e-6
        assert abs(row.vi - (h_tc + h_ct)) < 1e-6

    def test_identical_clusterings(self, spark):
        from idd_hw6_record_linkage_spark.operators.evaluation import (
            cluster_entropy_metrics,
        )

        rows = [("a", "x"), ("b", "x"), ("c", "y")]
        r = cluster_entropy_metrics(
            spark.createDataFrame(rows, ["url", "entity_id"]),
            spark.createDataFrame(rows, ["url", "truth_id"]),
        ).collect()[0]
        assert (r.homogeneity, r.completeness, r.v_measure, r.vi) == (
            1.0,
            1.0,
            1.0,
            0.0,
        )

    def test_single_cluster_vs_singletons(self, spark):
        # one mega-cluster vs all-singleton truth: perfectly complete
        # (no truth entity is split), zero homogeneity.
        from idd_hw6_record_linkage_spark.operators.evaluation import (
            cluster_entropy_metrics,
        )

        ids = [f"r{i}" for i in range(6)]
        r = cluster_entropy_metrics(
            spark.createDataFrame([(i, "all") for i in ids], ["url", "entity_id"]),
            spark.createDataFrame([(i, i) for i in ids], ["url", "truth_id"]),
        ).collect()[0]
        assert r.homogeneity == 0.0
        assert r.completeness == 1.0
        assert r.v_measure == 0.0


class TestAveragePrecision:
    def _brute(self, pairs, pos):
        by = defaultdict(lambda: [0, 0])
        for i, (_, _, s) in enumerate(pairs):
            by[s][0 if i in pos else 1] += 1
        cum_p = cum_t = 0
        ap = 0.0
        for s in sorted(by, reverse=True):
            np_, nn_ = by[s]
            cum_p += np_
            cum_t += np_ + nn_
            ap += (np_ / len(pos)) * (cum_p / cum_t)
        return ap

    def test_matches_tie_grouped_brute_force(self, spark):
        from idd_hw6_record_linkage_spark.operators.evaluation import (
            average_precision,
        )

        rng = random.Random(11)
        # 2-decimal scores force heavy ties — the tie-grouping path.
        pairs = [
            (f"a{i}", f"b{i}", round(rng.random(), 2)) for i in range(250)
        ]
        pos = set(rng.sample(range(250), 50))
        row = average_precision(
            spark.createDataFrame(pairs, ["id_l", "id_r", "score"]),
            spark.createDataFrame(
                [(pairs[i][0], pairs[i][1]) for i in pos], ["id_l", "id_r"]
            ),
        ).collect()[0]
        assert row.n_pos == 50 and row.n_neg == 200
        assert abs(row.average_precision - self._brute(pairs, pos)) < 1e-6

    def test_perfect_ranking_is_one(self, spark):
        from idd_hw6_record_linkage_spark.operators.evaluation import (
            average_precision,
        )

        pairs = [("a", "b", 0.9), ("c", "d", 0.8), ("e", "f", 0.1)]
        row = average_precision(
            spark.createDataFrame(pairs, ["id_l", "id_r", "score"]),
            spark.createDataFrame(
                [("a", "b"), ("c", "d")], ["id_l", "id_r"]
            ),
        ).collect()[0]
        assert row.average_precision == 1.0


class TestTriangleSupport:
    def test_matches_neighborhood_intersection(self, spark):
        from idd_hw6_record_linkage_spark.operators.clustering import (
            triangle_support,
        )

        rng = random.Random(13)
        nodes = [f"n{i}" for i in range(30)]
        eset = set()
        while len(eset) < 90:
            a, b = rng.sample(nodes, 2)
            eset.add((min(a, b), max(a, b)))
        # feed ~30% of edges reversed + a duplicate: canonicalization
        # and distinct must absorb both.
        rows = [
            (b, a) if rng.random() < 0.3 else (a, b) for a, b in eset
        ] + [next(iter(eset))]
        out = {
            (r.id_l, r.id_r): r.n_triangles
            for r in triangle_support(
                spark.createDataFrame(rows, ["id_l", "id_r"])
            ).collect()
        }
        adj = defaultdict(set)
        for a, b in eset:
            adj[a].add(b)
            adj[b].add(a)
        brute = {(a, b): len(adj[a] & adj[b]) for a, b in eset}
        assert out == brute

    def test_hub_star_has_no_triangles(self, spark):
        # A pure star (the mega-hub skew shape) has zero triangles;
        # every spoke is a bridge.
        from idd_hw6_record_linkage_spark.operators.clustering import (
            triangle_support,
        )

        rows = [("hub", f"s{i}") for i in range(20)]
        out = triangle_support(
            spark.createDataFrame(rows, ["id_l", "id_r"])
        ).collect()
        assert len(out) == 20
        assert all(r.n_triangles == 0 for r in out)

    def test_filter_weak_bridges_splits_glued_entities(self, spark):
        # two triangles glued by one weak bridge: the bridge must go,
        # both triangles must survive intact.
        from idd_hw6_record_linkage_spark.operators.clustering import (
            clusters_from_edges,
            filter_weak_bridges,
        )

        tri1 = [("a", "b"), ("a", "c"), ("b", "c")]
        tri2 = [("x", "y"), ("x", "z"), ("y", "z")]
        edges = spark.createDataFrame(
            [(l, r, 0.95) for l, r in tri1 + tri2] + [("c", "x", 0.55)],
            ["id_l", "id_r", "score"],
        )
        kept = filter_weak_bridges(edges, min_bridge_score=0.8)
        kept_pairs = {(r.id_l, r.id_r) for r in kept.collect()}
        assert kept_pairs == set(tri1 + tri2)
        nodes = spark.createDataFrame(
            [(n,) for n in "abcxyz"], ["doc_id"]
        )
        cl = clusters_from_edges(kept, nodes, id_col="doc_id")
        ent = {r.url: r.entity_id for r in cl.collect()}
        assert ent["a"] == ent["b"] == ent["c"]
        assert ent["x"] == ent["y"] == ent["z"]
        assert ent["a"] != ent["x"]

    def test_filter_weak_bridges_keeps_strong_bridge(self, spark):
        from idd_hw6_record_linkage_spark.operators.clustering import (
            filter_weak_bridges,
        )

        edges = spark.createDataFrame(
            [("a", "b", 0.95), ("b", "c", 0.85)], ["id_l", "id_r", "score"]
        )
        kept = {(r.id_l, r.id_r) for r in filter_weak_bridges(edges).collect()}
        # both edges are bridges (no triangles) but score >= 0.8 keeps them
        assert kept == {("a", "b"), ("b", "c")}

    def test_clique_counts(self, spark):
        # K4: every edge sits in exactly 2 triangles, 4 triangles total.
        from idd_hw6_record_linkage_spark.operators.clustering import (
            triangle_support,
        )

        nodes = ["a", "b", "c", "d"]
        rows = list(itertools.combinations(nodes, 2))
        out = triangle_support(
            spark.createDataFrame(rows, ["id_l", "id_r"])
        ).collect()
        assert len(out) == 6
        assert all(r.n_triangles == 2 for r in out)
