"""Exact whole-cluster agreement (evaluation.exact_cluster_match):
CEAF-style same-member-set counting on planted partitions.
"""

from __future__ import annotations

from idd_hw6_record_linkage_spark.operators.evaluation import (
    exact_cluster_match,
)


def _df(spark, assign: dict[str, str], col: str):
    return spark.createDataFrame(
        [(k, v) for k, v in assign.items()], f"url string, {col} string"
    )


def _run(spark, pred: dict[str, str], truth: dict[str, str]):
    return exact_cluster_match(
        _df(spark, pred, "entity_id"), _df(spark, truth, "truth_id")
    ).collect()[0]


def test_perfect_partition(spark):
    pred = {"a": "c1", "b": "c1", "c": "c2"}
    truth = {"a": "t1", "b": "t1", "c": "t2"}
    r = _run(spark, pred, truth)
    assert (r.n_exact_clusters, r.cluster_precision, r.cluster_recall) == (
        2, 1.0, 1.0,
    )


def test_partial_match(spark):
    # pred: {a,b} {c,d} {e}; truth: {a,b} {c} {d} {e}
    pred = {"a": "p1", "b": "p1", "c": "p2", "d": "p2", "e": "p3"}
    truth = {"a": "t1", "b": "t1", "c": "t2", "d": "t3", "e": "t4"}
    r = _run(spark, pred, truth)
    # exact: {a,b} and {e} -> 2 of 3 pred, 2 of 4 truth
    assert r.n_exact_clusters == 2
    assert r.cluster_precision == round(2 / 3, 6)
    assert r.cluster_recall == 0.5
    assert r.n_records == 5 and r.n_pred_clusters == 3
    assert r.n_truth_clusters == 4


def test_subset_is_not_exact(spark):
    # pred {a,b} is a strict subset of truth {a,b,c}: saturated on the
    # pred side (n_ct = n_c) but not the truth side (n_ct < n_t).
    pred = {"a": "p1", "b": "p1", "c": "p2"}
    truth = {"a": "t1", "b": "t1", "c": "t1"}
    r = _run(spark, pred, truth)
    assert r.n_exact_clusters == 0 and r.cluster_f1 == 0.0


def test_all_singletons_vs_one_cluster(spark):
    pred = {"a": "p1", "b": "p2"}
    truth = {"a": "t1", "b": "t1"}
    r = _run(spark, pred, truth)
    assert r.n_exact_clusters == 0
    assert r.cluster_precision == 0.0 and r.cluster_recall == 0.0
