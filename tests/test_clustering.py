"""Connected-components correctness: chains, cliques, singletons,
determinism (min-id representative)."""

from __future__ import annotations

from idd_hw6_record_linkage_spark.operators.clustering import (
    cluster_size_stats,
    clusters_from_edges,
    connected_components,
)


def _assign(spark, edges, nodes):
    e = spark.createDataFrame(edges, "id_l string, id_r string")
    n = spark.createDataFrame([(x,) for x in nodes], "id string")
    got = clusters_from_edges(e, n).collect()
    return {r["url"]: r["entity_id"] for r in got}


def test_simple_components(spark):
    nodes = list("abcdefg")
    edges = [("a", "b"), ("b", "c"), ("e", "d")]
    res = _assign(spark, edges, nodes)
    assert res["a"] == res["b"] == res["c"] == "a"
    assert res["d"] == res["e"] == "d"
    assert res["f"] == "f" and res["g"] == "g"


def test_long_chain(spark):
    n = 40
    nodes = [f"n{i:03d}" for i in range(n)]
    edges = [(nodes[i], nodes[i + 1]) for i in range(n - 1)]
    res = _assign(spark, edges, nodes)
    assert set(res.values()) == {"n000"}


def test_clique_and_direction_insensitivity(spark):
    nodes = ["x1", "x2", "x3", "x4"]
    edges = [("x2", "x1"), ("x3", "x2"), ("x4", "x1"), ("x3", "x4")]
    res = _assign(spark, edges, nodes)
    assert set(res.values()) == {"x1"}


def test_component_assignment_only_edge_nodes(spark):
    e = spark.createDataFrame([("b", "a"), ("c", "b")], "id_l string, id_r string")
    got = {r["id"]: r["component"] for r in connected_components(e).collect()}
    assert got == {"a": "a", "b": "a", "c": "a"}


def test_cluster_size_stats(spark):
    # components: {a,b,c} size 3, {d,e} size 2, singletons f, g
    nodes = ["a", "b", "c", "d", "e", "f", "g"]
    edges = [("a", "b"), ("b", "c"), ("d", "e")]
    e = spark.createDataFrame(edges, "id_l string, id_r string")
    n = spark.createDataFrame([(x,) for x in nodes], "id string")
    hist = {
        r["cluster_size"]: r["n_clusters"]
        for r in cluster_size_stats(clusters_from_edges(e, n)).collect()
    }
    assert hist == {3: 1, 2: 1, 1: 2}
