"""As-of join (operators.asof): backward at-or-before semantics on
hand-built timelines."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.operators import asof

T = dt.datetime


def _df(spark, rows, ddl):
    return spark.createDataFrame(rows, ddl)


def test_asof_backward_basic_and_no_match(spark):
    left = _df(
        spark,
        [
            (1, 10, T(2024, 1, 1, 12, 0)),
            (2, 10, T(2024, 1, 1, 9, 0)),  # before any right row
            (3, 20, T(2024, 1, 1, 12, 0)),  # key with no right rows
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = _df(
        spark,
        [
            (10, T(2024, 1, 1, 10, 0), "a"),
            (10, T(2024, 1, 1, 11, 30), "b"),
            (10, T(2024, 1, 1, 13, 0), "c"),  # after left #1 — ignored
        ],
        "user_id long, rts timestamp, tag string",
    )
    out = {
        r["event_id"]: r["asof"]
        for r in asof.asof_join_backward(
            left, right, "user_id", "ts", "rts"
        ).collect()
    }
    assert out[1]["tag"] == "b"  # latest at-or-before 12:00
    assert out[2] is None  # nothing before 9:00
    assert out[3] is None  # no right rows for key 20


def test_asof_simultaneous_right_row_matches(spark):
    left = _df(
        spark,
        [(1, 10, T(2024, 1, 1, 10, 0))],
        "event_id long, user_id long, ts timestamp",
    )
    right = _df(
        spark,
        [(10, T(2024, 1, 1, 10, 0), "same-instant")],
        "user_id long, rts timestamp, tag string",
    )
    out = asof.asof_join_backward(
        left, right, "user_id", "ts", "rts"
    ).collect()
    assert out[0]["asof"]["tag"] == "same-instant"  # at-OR-before


def test_asof_tiebreak_picks_latest(spark):
    left = _df(
        spark,
        [(1, 10, T(2024, 1, 1, 12, 0))],
        "event_id long, user_id long, ts timestamp",
    )
    right = _df(
        spark,
        [
            (10, T(2024, 1, 1, 10, 0), 1, "first"),
            (10, T(2024, 1, 1, 10, 0), 2, "second"),
        ],
        "user_id long, rts timestamp, seq long, tag string",
    )
    out = asof.asof_join_backward(
        left, right, "user_id", "ts", "rts", right_tiebreak="seq"
    ).collect()
    assert out[0]["asof"]["tag"] == "second"


def test_asof_null_timestamps_excluded(spark):
    left = _df(
        spark,
        [(1, 10, T(2024, 1, 1, 12, 0)), (2, 10, None)],
        "event_id long, user_id long, ts timestamp",
    )
    right = _df(
        spark,
        [(10, None, "ghost"), (10, T(2024, 1, 1, 11, 0), "real")],
        "user_id long, rts timestamp, tag string",
    )
    rows = asof.asof_join_backward(
        left, right, "user_id", "ts", "rts"
    ).collect()
    assert [r["event_id"] for r in rows] == [1]  # NULL-ts left dropped
    assert rows[0]["asof"]["tag"] == "real"  # NULL-ts right never matches


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized cross-check vs pandas.merge_asof on one key."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    lts = np.sort(rng.randint(0, 10_000, 200))
    rts = np.sort(rng.randint(0, 10_000, 80))
    lpd = pd.DataFrame(
        {"event_id": range(200), "k": 1,
         "ts": pd.to_datetime(lts, unit="s")}
    )
    rpd = pd.DataFrame({"k": 1, "rts": pd.to_datetime(rts, unit="s")})
    want = pd.merge_asof(
        lpd, rpd, left_on="ts", right_on="rts", by="k"
    ).set_index("event_id")["rts"]
    out = asof.asof_join_backward(
        spark.createDataFrame(lpd),
        spark.createDataFrame(rpd),
        "k",
        "ts",
        "rts",
    ).collect()
    for r in out:
        exp = want[r["event_id"]]
        got = r["asof"]["rts"] if r["asof"] is not None else None
        if pd.isna(exp):
            assert got is None
        else:
            assert got == exp.to_pydatetime()
