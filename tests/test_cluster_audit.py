"""cluster_quality: hand-built cluster shapes — a triangle (dense), a
chain (sparse, bridge members), a single pair, singletons excluded."""

from __future__ import annotations

import pytest

from idd_hw6_record_linkage_spark.operators.cluster_audit import (
    cluster_quality,
)


@pytest.fixture(scope="module")
def audited(spark):
    # c_a: triangle a1-a2-a3 (complete). c_b: chain b1-b2-b3-b4.
    # c_c: pair c1-c2 (+ a duplicate edge). s1: singleton.
    clusters = spark.createDataFrame(
        [
            ("a1", "c_a"), ("a2", "c_a"), ("a3", "c_a"),
            ("b1", "c_b"), ("b2", "c_b"), ("b3", "c_b"), ("b4", "c_b"),
            ("c1", "c_c"), ("c2", "c_c"),
            ("s1", "s1"),
        ],
        "url string, entity_id string",
    )
    edges = spark.createDataFrame(
        [
            ("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
            ("b1", "b2"), ("b2", "b3"), ("b3", "b4"),
            ("c1", "c2"), ("c1", "c2"),
        ],
        "id_l string, id_r string",
    )
    out = cluster_quality(clusters, edges, min_density=0.9)
    return {r["entity_id"]: r for r in out.collect()}


def test_shapes(audited):
    assert set(audited) == {"c_a", "c_b", "c_c"}  # singleton excluded
    tri = audited["c_a"]
    assert (tri["n_members"], tri["n_edges"]) == (3, 3)
    assert tri["density"] == 1.0
    assert tri["min_degree"] == 2
    assert not tri["suspect"]

    chain = audited["c_b"]
    assert (chain["n_members"], chain["n_edges"]) == (4, 3)
    assert chain["density"] == pytest.approx(0.5)
    assert chain["min_degree"] == 1
    assert chain["suspect"]

    pair = audited["c_c"]
    assert (pair["n_members"], pair["n_edges"]) == (2, 1)  # dup collapsed
    assert pair["density"] == 1.0
    assert not pair["suspect"]  # a pair is allowed min_degree 1


def test_real_clustering_is_never_zero_edge(spark):
    """Every multi-member cluster produced by connected components has
    n_edges >= n_members - 1 (spanning), so density > 0 always."""
    from idd_hw6_record_linkage_spark.operators.clustering import (
        clusters_from_edges,
    )

    edges = spark.createDataFrame(
        [("u1", "u2"), ("u2", "u3"), ("u5", "u6")],
        "id_l string, id_r string",
    )
    ids = spark.createDataFrame(
        [(f"u{i}",) for i in range(1, 8)], "url string"
    )
    clusters = clusters_from_edges(edges, ids, id_col="url")
    out = cluster_quality(clusters, edges)
    for r in out.collect():
        assert r["n_edges"] >= r["n_members"] - 1
        assert r["density"] > 0.0


def test_constraint_check_flags_and_nulls(spark):
    from idd_hw6_record_linkage_spark.operators.cluster_audit import (
        cannot_link_violations,
        constraint_check,
    )

    clusters = spark.createDataFrame(
        [("a1", "c_a"), ("a2", "c_a"), ("b1", "c_b"), ("c1", "c_c")],
        "url string, entity_id string",
    )
    pairs = spark.createDataFrame(
        [
            ("a1", "a2"),   # same cluster -> violated
            ("a1", "b1"),   # different clusters -> ok
            ("a1", "zz"),   # right id unknown -> NULL cluster, ok
            ("zz", "yy"),   # both unknown -> ok
        ],
        "id_l string, id_r string",
    )
    got = {
        (r.id_l, r.id_r): (r.cluster_l, r.cluster_r, r.violated)
        for r in constraint_check(clusters, pairs).collect()
    }
    assert got[("a1", "a2")] == ("c_a", "c_a", True)
    assert got[("a1", "b1")] == ("c_a", "c_b", False)
    assert got[("a1", "zz")] == ("c_a", None, False)  # false, NOT null
    assert got[("zz", "yy")] == (None, None, False)
    viol = cannot_link_violations(clusters, pairs).collect()
    assert [(r.id_l, r.id_r) for r in viol] == [("a1", "a2")]


def test_constraint_contract_query_shape(spark):
    from idd_hw6_record_linkage_spark import entry_queries as EQ

    df = EQ.rl_constraint_check(spark, "/root/testdata/sf0.001")
    assert df.columns == [
        "source", "id_l", "id_r", "cluster_l", "cluster_r", "violated",
    ]
    rows = df.collect()
    assert rows  # at least one source has >= 2 docs
    # per-source pair of the two lowest doc_ids: ids are distinct and
    # both assigned (rl_clusters covers every doc)
    for r in rows:
        assert r.id_l != r.id_r
        assert r.cluster_l is not None and r.cluster_r is not None
        assert r.violated == (r.cluster_l == r.cluster_r)
