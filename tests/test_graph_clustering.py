"""Star and pivot match-graph clustering
(operators.graph_clustering): hand-built toy graphs with known
answers, a pure-Python round-synchronous replica cross-checked on
seeded random graphs, and the operators' structural invariants
(radius-1 clusters, no adjacent centers/pivots, full coverage)."""

from __future__ import annotations

import hashlib
import random

from idd_hw6_record_linkage_spark.operators.graph_clustering import (
    pivot_clusters,
    star_clusters,
)


def _df_edges(spark, edges):
    if not edges:
        return spark.createDataFrame([], "id_l string, id_r string")
    return spark.createDataFrame(edges, ["id_l", "id_r"])


def _df_ids(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], ["id"])


def _rk(v: str) -> str:
    return hashlib.md5(v.encode()).hexdigest() + "|" + v


def _pivot_py(edges, ids, rounds):
    """Round-synchronous pivot replica."""
    nbr: dict[str, set[str]] = {i: set() for i in ids}
    for a, b in edges:
        if a != b:
            nbr[a].add(b)
            nbr[b].add(a)
    active = set(ids)
    out = {}
    for _ in range(rounds):
        if not active:
            break
        pivots = {
            v
            for v in active
            if all(_rk(v) < _rk(u) for u in nbr[v] if u in active)
        }
        for p in pivots:
            out[p] = p
        absorbed = {}
        for v in active - pivots:
            cand = [u for u in nbr[v] if u in pivots]
            if cand:
                absorbed[v] = min(cand, key=_rk)
        out.update(absorbed)
        active -= pivots
        active -= set(absorbed)
    for v in active:
        out[v] = v
    return out


class TestStar:
    def test_path_graph(self, spark):
        ids = ["a", "b", "c"]
        rows = star_clusters(
            _df_edges(spark, [("a", "b"), ("b", "c")]), _df_ids(spark, ids)
        ).collect()
        got = {r.url: (r.star_id, r.is_center) for r in rows}
        assert got == {
            "a": ("b", False),
            "b": ("b", True),
            "c": ("b", False),
        }

    def test_triangle_tie_by_id(self, spark):
        rows = star_clusters(
            _df_edges(spark, [("a", "b"), ("b", "c"), ("a", "c")]),
            _df_ids(spark, ["a", "b", "c"]),
        ).collect()
        got = {r.url: (r.star_id, r.is_center) for r in rows}
        assert got == {
            "a": ("a", True),
            "b": ("a", False),
            "c": ("a", False),
        }

    def test_two_hubs_and_orphan_satellites(self, spark):
        # h1 and h2 both have degree 4; h1 wins the id tie, so h2 is
        # dominated and its private leaves have NO adjacent center ->
        # singleton fallback with is_center=False.
        edges = (
            [("h1", x) for x in ["x1", "x2", "x3"]]
            + [("h2", y) for y in ["y1", "y2", "y3"]]
            + [("h1", "h2")]
        )
        ids = ["h1", "h2", "x1", "x2", "x3", "y1", "y2", "y3", "iso"]
        got = {
            r.url: (r.star_id, r.is_center)
            for r in star_clusters(
                _df_edges(spark, edges), _df_ids(spark, ids)
            ).collect()
        }
        assert got["h1"] == ("h1", True)
        assert got["h2"] == ("h1", False)  # attaches to adjacent center
        for x in ["x1", "x2", "x3"]:
            assert got[x] == ("h1", False)
        for y in ["y1", "y2", "y3"]:
            assert got[y] == (y, False)  # orphan satellite fallback
        assert got["iso"] == ("iso", True)  # isolated = trivial center

    def test_invariants_random(self, spark):
        rng = random.Random(7)
        ids = [f"n{i:02d}" for i in range(30)]
        edges = list(
            {
                tuple(sorted(rng.sample(ids, 2)))
                for _ in range(60)
            }
        )
        rows = star_clusters(
            _df_edges(spark, edges), _df_ids(spark, ids)
        ).collect()
        assert {r.url for r in rows} == set(ids)  # full coverage, once
        assert len(rows) == len(ids)
        eset = {frozenset(e) for e in edges}
        centers = {r.url for r in rows if r.is_center}
        for r in rows:
            if r.url != r.star_id:
                # radius-1: satellites attach across a real edge to a
                # real center
                assert frozenset((r.url, r.star_id)) in eset
                assert r.star_id in centers
        # no two adjacent centers
        for a, b in edges:
            assert not (a in centers and b in centers), (a, b)


class TestPivot:
    def test_matches_python_replica_random(self, spark):
        for seed, rounds in [(3, 1), (3, 2), (11, 4), (42, 4)]:
            rng = random.Random(seed)
            ids = [f"n{i:02d}" for i in range(24)]
            edges = list(
                {tuple(sorted(rng.sample(ids, 2))) for _ in range(40)}
            )
            got = {
                r.url: r.pivot_id
                for r in pivot_clusters(
                    _df_edges(spark, edges),
                    _df_ids(spark, ids),
                    rounds=rounds,
                ).collect()
            }
            assert got == _pivot_py(edges, ids, rounds), (seed, rounds)

    def test_rounds_zero_all_singletons(self, spark):
        ids = ["a", "b", "c"]
        got = {
            r.url: r.pivot_id
            for r in pivot_clusters(
                _df_edges(spark, [("a", "b")]), _df_ids(spark, ids), rounds=0
            ).collect()
        }
        assert got == {"a": "a", "b": "b", "c": "c"}

    def test_convergence_mode_settles_everything(self, spark):
        rng = random.Random(5)
        ids = [f"n{i:02d}" for i in range(20)]
        edges = list({tuple(sorted(rng.sample(ids, 2))) for _ in range(30)})
        rows = pivot_clusters(
            _df_edges(spark, edges), _df_ids(spark, ids), rounds=None
        ).collect()
        got = {r.url: r.pivot_id for r in rows}
        assert len(rows) == len(ids)
        # converged answer == replica run with a generous round budget
        assert got == _pivot_py(edges, ids, rounds=100)
        # every cluster is a radius-1 star around its pivot
        eset = {frozenset(e) for e in edges}
        for u, p in got.items():
            if u != p:
                assert frozenset((u, p)) in eset
        # no two adjacent pivots
        pivots = {p for p in got.values()}
        for a, b in edges:
            if a in pivots and b in pivots:
                # adjacent pivots can only happen across rounds if one
                # was absorbed... which is impossible: absorbed nodes
                # are never pivots. Assert outright.
                raise AssertionError((a, b))
