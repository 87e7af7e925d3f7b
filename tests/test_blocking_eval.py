"""scheme_metrics: hand-computed RR/PC, dedup of repeated pairs,
empty-truth guard, validation."""

from __future__ import annotations

import pytest

from idd_hw6_record_linkage_spark.operators.blocking_eval import (
    scheme_metrics,
)


@pytest.fixture(scope="module")
def tables(spark):
    truth = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6)], "id_l int, id_r int"
    )
    # scheme A finds 2 of 3 true pairs in 4 candidates (one repeated);
    # scheme B finds none in 1 candidate.
    a = spark.createDataFrame(
        [(1, 2), (1, 2), (3, 4), (2, 9), (7, 8)], "id_l int, id_r int"
    )
    b = spark.createDataFrame([(5, 9)], "id_l int, id_r int")
    return truth, a, b


def test_metrics_hand_computed(spark, tables):
    truth, a, b = tables
    # 10 records -> comparison space C(10,2) = 45
    out = {
        r["scheme"]: r
        for r in scheme_metrics({"a": a, "b": b}, truth, 10).collect()
    }
    assert out["a"]["n_pairs"] == 4  # duplicate (1,2) collapsed
    assert out["a"]["reduction_ratio"] == pytest.approx(1 - 4 / 45, abs=1e-6)
    assert out["a"]["pairs_completeness"] == pytest.approx(2 / 3, abs=1e-6)
    assert out["b"]["n_pairs"] == 1
    assert out["b"]["pairs_completeness"] == 0.0


def test_empty_truth_yields_zero_pc(spark, tables):
    truth, a, _ = tables
    out = scheme_metrics(
        {"a": a}, truth.where("id_l > 100"), 10
    ).collect()[0]
    assert out["pairs_completeness"] == 0.0


def test_validation(spark, tables):
    truth, a, _ = tables
    with pytest.raises(ValueError, match="empty"):
        scheme_metrics({}, truth, 10)
    with pytest.raises(ValueError, match="total_records"):
        scheme_metrics({"a": a}, truth, 1)
