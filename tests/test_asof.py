"""As-of join (operators.asof): backward at-or-before semantics on
hand-built timelines."""

from __future__ import annotations

import datetime as dt

import pytest
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


def test_asof_null_timestamps(spark):
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
    rows = {
        r["event_id"]: r["asof"]
        for r in asof.asof_join_backward(
            left, right, "user_id", "ts", "rts"
        ).collect()
    }
    # left-join semantics: NULL-ts left rows RETAINED, unmatched
    # (DuckDB ASOF LEFT JOIN parity, asserted in the driver oracle too)
    assert set(rows) == {1, 2}
    assert rows[1]["tag"] == "real"  # NULL-ts right never matches
    assert rows[2] is None


def test_asof_out_col_collision_raises(spark):
    import pytest

    left = _df(
        spark,
        [(1, 10, T(2024, 1, 1, 12, 0), "x")],
        "event_id long, user_id long, ts timestamp, asof string",
    )
    right = _df(
        spark,
        [(10, T(2024, 1, 1, 11, 0))],
        "user_id long, rts timestamp",
    )
    with pytest.raises(ValueError, match="out_col"):
        asof.asof_join_backward(left, right, "user_id", "ts", "rts")
    # renaming the output avoids the collision
    out = asof.asof_join_backward(
        left, right, "user_id", "ts", "rts", out_col="matched"
    ).collect()
    assert out[0]["matched"]["rts"] == T(2024, 1, 1, 11, 0)
    assert out[0]["asof"] == "x"  # the left column survives untouched


def test_asof_coarse_bucket_equals_one_pass_with_hot_key(spark):
    """The two-pass segmented-scan mode (coarse_bucket) must be
    result-identical to the one-pass window plan on a corpus with a
    planted mega-key (one key = 50% of rows) — including buckets with
    no right rows (carry must reach across empty buckets) and
    same-instant boundary rows."""
    import numpy as np

    rng = np.random.RandomState(11)
    base = dt.datetime(2024, 1, 1)
    # hot key 1: 400 left rows across 10 days; cold keys 2..40: 10 each
    lrows, rrows = [], []
    eid = 0
    for k, n in [(1, 400)] + [(k, 10) for k in range(2, 41)]:
        for _ in range(n):
            eid += 1
            lrows.append(
                (eid, k, base + dt.timedelta(seconds=int(rng.randint(0, 864000))))
            )
        # right rows: sparse, and NONE in days 4-6 for the hot key so
        # the carry pass must cross empty buckets
        for j in range(max(2, n // 20)):
            ts = int(rng.randint(0, 864000))
            if k == 1 and 3 * 86400 <= ts < 7 * 86400:
                ts = ts % (3 * 86400)
            rrows.append((k, base + dt.timedelta(seconds=ts), f"{k}:{j}"))
    left = _df(spark, lrows, "event_id long, user_id long, ts timestamp")
    right = _df(spark, rrows, "user_id long, rts timestamp, tag string")
    naive = {
        r["event_id"]: (r["asof"]["rts"], r["asof"]["tag"])
        if r["asof"] is not None else None
        for r in asof.asof_join_backward(
            left, right, "user_id", "ts", "rts", right_tiebreak="tag"
        ).collect()
    }
    for unit in ("day", "hour"):
        two_pass = {
            r["event_id"]: (r["asof"]["rts"], r["asof"]["tag"])
            if r["asof"] is not None else None
            for r in asof.asof_join_backward(
                left, right, "user_id", "ts", "rts",
                right_tiebreak="tag", coarse_bucket=unit,
            ).collect()
        }
        assert two_pass == naive, f"coarse_bucket={unit} diverged"


def _pandas_fixture(seed=7, n_l=200, n_r=80, n_keys=3):
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(seed)
    lpd = pd.DataFrame(
        {
            "event_id": range(n_l),
            "k": rng.randint(1, n_keys + 1, n_l),
            "ts": pd.to_datetime(rng.randint(0, 10_000, n_l), unit="s"),
        }
    ).sort_values("ts", kind="stable").reset_index(drop=True)
    rpd = pd.DataFrame(
        {
            "k": rng.randint(1, n_keys + 1, n_r),
            "rts": pd.to_datetime(
                np.sort(rng.randint(0, 10_000, n_r)), unit="s"
            ),
        }
    )
    return lpd, rpd


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_matches_pandas_merge_asof(spark, direction):
    """Randomized multi-key cross-check vs pandas.merge_asof for all
    three directions (pandas is the semantics oracle, including the
    nearest tie → backward rule)."""
    import pandas as pd

    lpd, rpd = _pandas_fixture()
    want = pd.merge_asof(
        lpd, rpd.sort_values("rts"), left_on="ts", right_on="rts",
        by="k", direction=direction,
    ).set_index("event_id")["rts"]
    out = asof.asof_join(
        spark.createDataFrame(lpd),
        spark.createDataFrame(rpd),
        "k",
        "ts",
        "rts",
        direction=direction,
    ).collect()
    assert len(out) == len(lpd)
    for r in out:
        exp = want[r["event_id"]]
        got = r["asof"]["rts"] if r["asof"] is not None else None
        if pd.isna(exp):
            assert got is None, (direction, r["event_id"])
        else:
            assert got == exp.to_pydatetime(), (direction, r["event_id"])


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_tolerance_matches_pandas(spark, direction):
    import pandas as pd

    lpd, rpd = _pandas_fixture(seed=13)
    tol_s = 120
    want = pd.merge_asof(
        lpd, rpd.sort_values("rts"), left_on="ts", right_on="rts",
        by="k", direction=direction, tolerance=pd.Timedelta(seconds=tol_s),
    ).set_index("event_id")["rts"]
    out = asof.asof_join(
        spark.createDataFrame(lpd),
        spark.createDataFrame(rpd),
        "k",
        "ts",
        "rts",
        direction=direction,
        tolerance=tol_s,
    ).collect()
    for r in out:
        exp = want[r["event_id"]]
        got = r["asof"]["rts"] if r["asof"] is not None else None
        if pd.isna(exp):
            assert got is None, (direction, r["event_id"])
        else:
            assert got == exp.to_pydatetime(), (direction, r["event_id"])


def test_asof_forward_coarse_bucket_equals_one_pass(spark):
    """The forward two-pass mode must equal the one-pass plan (carry
    must come from LATER buckets, crossing empty ones)."""
    import numpy as np

    rng = np.random.RandomState(23)
    base = dt.datetime(2024, 1, 1)
    lrows = [
        (i, int(k), base + dt.timedelta(seconds=int(rng.randint(0, 864000))))
        for i, k in enumerate(rng.randint(1, 6, 300))
    ]
    rrows = []
    for k in range(1, 6):
        for j in range(4):
            ts = int(rng.randint(0, 864000))
            if k == 1 and 2 * 86400 <= ts < 6 * 86400:
                ts = ts % (2 * 86400)  # empty middle days for key 1
            rrows.append((k, base + dt.timedelta(seconds=ts), f"{k}:{j}"))
    left = _df(spark, lrows, "event_id long, user_id long, ts timestamp")
    right = _df(spark, rrows, "user_id long, rts timestamp, tag string")

    def run(**kw):
        return {
            r["event_id"]: (r["asof"]["rts"], r["asof"]["tag"])
            if r["asof"] is not None else None
            for r in asof.asof_join(
                left, right, "user_id", "ts", "rts",
                direction="forward", right_tiebreak="tag", **kw,
            ).collect()
        }

    assert run(coarse_bucket="day") == run()


def test_asof_nearest_rejects_coarse_bucket(spark):
    left = _df(spark, [(1, 10, T(2024, 1, 1))],
               "event_id long, user_id long, ts timestamp")
    right = _df(spark, [(10, T(2024, 1, 1))], "user_id long, rts timestamp")
    with pytest.raises(ValueError, match="nearest"):
        asof.asof_join(left, right, "user_id", "ts", "rts",
                       direction="nearest", coarse_bucket="day")
