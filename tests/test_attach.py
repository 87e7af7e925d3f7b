"""attach_to_clusters: best-cluster selection via max member score,
threshold gating, deterministic ties, singleton founding."""

from __future__ import annotations

import pytest

from idd_hw6_record_linkage_spark.operators.attach import (
    attach_to_clusters,
)


@pytest.fixture(scope="module")
def attached(spark):
    clusters = spark.createDataFrame(
        [("e1", "c1"), ("e2", "c1"), ("e3", "c2"), ("e4", "c2")],
        "url string, entity_id string",
    )
    scored = spark.createDataFrame(
        [
            # n1: c1 via e2 (0.9) beats c2 via e3 (0.7)
            ("n1", "e1", 0.6), ("n1", "e2", 0.9), ("n1", "e3", 0.7),
            # n2: only sub-threshold evidence
            ("n2", "e1", 0.4),
            # n3: exact tie between c1 and c2 -> smaller label c1
            ("n3", "e1", 0.8), ("n3", "e4", 0.8),
            # n4: no candidate rows at all
        ],
        "id_new string, id_old string, score double",
    )
    new_ids = spark.createDataFrame(
        [("n1",), ("n2",), ("n3",), ("n4",)], "url string"
    )
    out = attach_to_clusters(scored, clusters, new_ids, threshold=0.5)
    return {r["url"]: r for r in out.collect()}


def test_best_cluster_by_max_member_score(attached):
    assert attached["n1"]["entity_id"] == "c1"
    assert attached["n1"]["attach_score"] == pytest.approx(0.9)
    assert attached["n1"]["attached"]


def test_threshold_gates_and_founds_singleton(attached):
    for nid in ("n2", "n4"):
        assert attached[nid]["entity_id"] == nid
        assert attached[nid]["attach_score"] is None
        assert not attached[nid]["attached"]


def test_tie_breaks_to_smaller_entity(attached):
    assert attached["n3"]["entity_id"] == "c1"


def test_one_row_per_new_record(attached):
    assert set(attached) == {"n1", "n2", "n3", "n4"}
