"""Range (point-in-interval) join (operators.range_join)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.operators import range_join

T = dt.datetime


def _points(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    )


def _intervals(spark, rows):
    return spark.createDataFrame(
        rows, "iid long, user_id long, w_start timestamp, w_end timestamp"
    )


def test_range_join_basic_inclusive_bounds(spark):
    pts = _points(
        spark,
        [
            (1, 10, T(2024, 1, 1, 12, 0)),  # inside
            (2, 10, T(2024, 1, 2, 0, 0)),  # exactly at end — inclusive
            (3, 10, T(2024, 1, 1, 0, 0)),  # exactly at start — inclusive
            (4, 10, T(2024, 1, 3, 0, 0)),  # after end
            (5, 20, T(2024, 1, 1, 12, 0)),  # other key, no interval
        ],
    )
    ivs = _intervals(
        spark, [(100, 10, T(2024, 1, 1, 0, 0), T(2024, 1, 2, 0, 0))]
    )
    out = range_join.point_in_interval_join(
        pts, ivs, "user_id", "ts", "w_start", "w_end", bucket_seconds=3600
    )
    got = sorted(r["event_id"] for r in out.collect())
    assert got == [1, 2, 3]


def test_range_join_multi_match_and_long_interval(spark):
    """A point inside two overlapping intervals joins twice; an
    interval spanning many buckets still matches once per pair."""
    pts = _points(spark, [(1, 10, T(2024, 1, 5, 12, 0))])
    ivs = _intervals(
        spark,
        [
            (100, 10, T(2024, 1, 1, 0, 0), T(2024, 1, 31, 0, 0)),  # 30 d
            (200, 10, T(2024, 1, 5, 0, 0), T(2024, 1, 6, 0, 0)),
        ],
    )
    out = range_join.point_in_interval_join(
        pts, ivs, "user_id", "ts", "w_start", "w_end", bucket_seconds=86400
    )
    got = sorted(r["interval"]["iid"] for r in out.collect())
    assert got == [100, 200]  # exactly once each, no bucket dup


def test_range_join_empty_and_null_intervals_never_match(spark):
    pts = _points(spark, [(1, 10, T(2024, 1, 1, 12, 0))])
    ivs = _intervals(
        spark,
        [
            (100, 10, T(2024, 1, 2, 0, 0), T(2024, 1, 1, 0, 0)),  # end<start
            (200, 10, None, T(2024, 1, 2, 0, 0)),
            (300, 10, T(2024, 1, 1, 0, 0), None),
        ],
    )
    out = range_join.point_in_interval_join(
        pts, ivs, "user_id", "ts", "w_start", "w_end"
    )
    assert out.count() == 0


def test_range_join_rejects_bad_bucket(spark):
    pts = _points(spark, [(1, 10, T(2024, 1, 1))])
    ivs = _intervals(spark, [(100, 10, T(2024, 1, 1), T(2024, 1, 2))])
    with pytest.raises(ValueError, match="positive"):
        range_join.point_in_interval_join(
            pts, ivs, "user_id", "ts", "w_start", "w_end", bucket_seconds=0
        )


def test_range_join_no_cartesian_in_plan(spark):
    pts = _points(spark, [(1, 10, T(2024, 1, 1, 12, 0))])
    ivs = _intervals(
        spark, [(100, 10, T(2024, 1, 1, 0, 0), T(2024, 1, 2, 0, 0))]
    )
    out = range_join.point_in_interval_join(
        pts, ivs, "user_id", "ts", "w_start", "w_end"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
