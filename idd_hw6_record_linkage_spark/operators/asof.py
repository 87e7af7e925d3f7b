"""As-of join — the classic temporal operator Spark has no native
form of: for every left row, attach the right row nearest in time
per key. All three ``pd.merge_asof`` directions:

- ``backward`` (default): latest right at-or-before the left ts
  (DuckDB ``ASOF JOIN`` ``>=`` semantics);
- ``forward``: earliest right at-or-after;
- ``nearest``: whichever of the two is closer, ties → backward
  (verified against pandas: probe at equidistant candidates picks the
  earlier row).

Implementation is the union+window trick, fully native (no
``applyInPandas``/``merge_asof``, no per-group Python): tag both
sides, union, and take ``last(right_payload, ignorenulls=True)`` over
a per-key window ordered by (ts, side) — the side tag sorts a
same-instant right row INTO the frame (at-or-before / at-or-after).
ONE shuffle (the per-key window); ``nearest`` runs both directions as
two window specs over the same partitioning, so it still shuffles
once. The alternative broadcast-range or bucketize-and-filter plans
only win when one side is tiny.

Hot keys: a mega-key (one domain = 10% of events) serializes through
a single window partition. ``coarse_bucket`` activates a two-pass
segmented scan (the same trick sampling.pack_shards uses for its
global prefix sum): pass 1 windows within (key, coarse time bucket)
— the hot key's rows now spread across as many partitions as it has
buckets — and pass 2 carries the boundary right row of each earlier
(later, for forward) bucket over a per-key window on the
(key, bucket) SUMMARY table (one row per key-bucket, so the hot key
costs B rows, not N). Result-equality to the one-pass plan is
asserted in tests/test_asof.py with a planted hot key.

``tolerance``: optional maximum time distance (seconds for timestamp
columns, raw units for numeric ts columns) — a match farther than
the tolerance becomes NULL, exactly ``pd.merge_asof(tolerance=...)``.

Ties inside the right side (two right rows with the SAME key and
timestamp) resolve via ``right_tiebreak``: backward picks the LATEST
in (ts, tiebreak) order, forward the EARLIEST — else arbitrarily,
the same contract as DuckDB ASOF JOIN.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType, TimestampType, TimestampNTZType

__all__ = ["asof_join", "asof_join_backward"]

_INTERNAL = ("__key", "__ts", "__side", "__l", "__r", "__bucket")


def _ts_num(col: Column, dtype) -> Column:
    """Numeric basis for time-distance arithmetic: microseconds for
    timestamps, the raw value for numeric ts columns. TIMESTAMP_NTZ
    needs the cast — unix_micros accepts only TIMESTAMP, and with the
    session pinned to UTC the cast is an identity relabel."""
    if isinstance(dtype, (TimestampType, TimestampNTZType)):
        return F.unix_micros(col.cast("timestamp"))
    return col.cast("double")


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_tiebreak: str | None = None,
    out_col: str = "asof",
    coarse_bucket: str | None = None,
) -> DataFrame:
    """Backward as-of join (see :func:`asof_join`)."""
    return asof_join(
        left, right, key, left_ts, right_ts,
        right_tiebreak=right_tiebreak, out_col=out_col,
        coarse_bucket=coarse_bucket, direction="backward",
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    right_tiebreak: str | None = None,
    out_col: str = "asof",
    coarse_bucket: str | None = None,
    tolerance: float | None = None,
) -> DataFrame:
    """Every left row + a nullable ``out_col`` struct holding the
    matched right row (all right columns); NULL when no right row
    qualifies for the key. NULL-timestamp left rows are RETAINED with
    ``out_col`` = NULL (they cannot match anything but this is a
    left-join-style operator — dropping them would be silent row
    loss); NULL-timestamp right rows never get matched.

    ``coarse_bucket``: optional hot-key mitigation — a ``date_trunc``
    unit ('day', 'hour', 'week', ...) applied to the timestamp. The
    per-key window becomes per-(key, bucket) plus a carry pass over
    the tiny per-bucket summary; results are identical to the
    one-pass plan for any bucket unit (asserted in tests). Timestamp
    ts columns only.

    ``tolerance``: optional max |Δt| (seconds for timestamps, raw
    units for numerics); farther matches become NULL.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest: {direction!r}"
        )
    if direction == "nearest" and coarse_bucket is not None:
        raise ValueError(
            "coarse_bucket is not supported with direction='nearest' "
            "(a nearest match can cross a bucket boundary in either "
            "direction) — run backward and forward with coarse_bucket "
            "and combine, or use the one-pass nearest"
        )
    if out_col in left.columns:
        raise ValueError(
            f"asof_join: left already has a column named {out_col!r} — "
            f"pass out_col= a non-colliding name"
        )
    for c in _INTERNAL:
        if c in left.columns or c in right.columns:
            raise ValueError(
                f"asof_join: column {c!r} is reserved internally"
            )
    asof_type = StructType(right.schema.fields)
    ts_dtype = left.schema[left_ts].dataType

    # side tags order same-instant right rows INTO the frame:
    # backward scans preceding → right must sort BEFORE left at equal
    # ts; forward scans following → right must sort AFTER left.
    l_side, r_side = (1, 0) if direction != "forward" else (0, 1)
    l2 = left.where(F.col(left_ts).isNotNull()).select(
        F.col(key).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(l_side).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    r2 = right.where(F.col(right_ts).isNotNull()).select(
        F.col(key).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(r_side).alias("__side"),
        F.struct(*[F.col(c) for c in right.columns]).alias("__r"),
    )
    u = l2.unionByName(r2, allowMissingColumns=True)

    def order_cols() -> list[Column]:
        cols: list[Column] = [F.col("__ts"), F.col("__side")]
        if right_tiebreak is not None:
            # left rows are NULL in __r and sort first among equals,
            # which is irrelevant (the left row is the probe, not a
            # candidate). Backward keeps the LATEST tied right row
            # (last over ascending), forward the EARLIEST (first over
            # ascending) — both want plain ascending order.
            cols.append(F.col("__r").getField(right_tiebreak))
        return cols

    if direction == "nearest":
        # both directions over the SAME per-key partitioning — one
        # Exchange, two Sort+Window passes. The side tag is built for
        # backward (right first at equal ts); the forward pass must
        # then treat a same-instant right row as in-frame, which
        # (ts, __side) ascending + first-over-[current, following]
        # already does NOT give (the right row sorts before the left
        # probe). Order the forward pass by (ts, -side) instead: right
        # rows sort after left at equal ts and land in the frame.
        back = _one_pass(u, order_cols(), "backward")
        fwd_order = [F.col("__ts"), F.col("__side").desc()]
        if right_tiebreak is not None:
            fwd_order.append(F.col("__r").getField(right_tiebreak))
        fwd = F.first("__r", ignorenulls=True).over(
            Window.partitionBy("__key")
            .orderBy(*fwd_order)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        n = _ts_num(F.col("__ts"), ts_dtype)
        bdist = n - _ts_num(back.getField(right_ts), ts_dtype)
        fdist = _ts_num(fwd.getField(right_ts), ts_dtype) - n
        chosen = (
            F.when(back.isNull(), fwd)
            .when(fwd.isNull(), back)
            .when(bdist <= fdist, back)  # ties → backward (pandas)
            .otherwise(fwd)
        )
        matched = u.withColumn(out_col, chosen).where(
            F.col("__side") == l_side
        )
    elif coarse_bucket is None:
        matched = u.withColumn(
            out_col, _one_pass(u, order_cols(), direction)
        ).where(F.col("__side") == l_side)
    else:
        matched = _two_pass(
            u, order_cols(), out_col, coarse_bucket, direction,
            l_side,
        )

    if tolerance is not None:
        n = _ts_num(F.col("__ts"), ts_dtype)
        rn = _ts_num(F.col(out_col).getField(right_ts), ts_dtype)
        scale = (
            1_000_000.0
            if isinstance(ts_dtype, (TimestampType, TimestampNTZType))
            else 1.0
        )
        matched = matched.withColumn(
            out_col,
            F.when(
                F.abs(n - rn) <= F.lit(float(tolerance) * scale),
                F.col(out_col),
            ),
        )

    out = matched.select("__l.*", out_col)
    # NULL-timestamp left rows: retained, unmatched by definition.
    null_ts = left.where(F.col(left_ts).isNull()).withColumn(
        out_col, F.lit(None).cast(asof_type)
    )
    return out.unionByName(null_ts)


def _one_pass(u: DataFrame, order: list[Column], direction: str) -> Column:
    if direction == "backward":
        w = (
            Window.partitionBy("__key")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last("__r", ignorenulls=True).over(w)
    w = (
        Window.partitionBy("__key")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return F.first("__r", ignorenulls=True).over(w)


def _two_pass(
    u: DataFrame,
    order: list[Column],
    out_col: str,
    unit: str,
    direction: str,
    l_side: int,
) -> DataFrame:
    """Segmented as-of scan: window within (key, date_trunc(unit, ts)),
    then coalesce with the boundary right row carried from strictly
    earlier (backward) / later (forward) buckets. Correct because
    date_trunc is monotone in ts: every right row in an earlier bucket
    is at-or-before every left ts in a later bucket (mirrored for
    forward), and any same-bucket match is closer than any carried row
    — so coalesce(within_bucket, carry) is exactly the one-pass
    answer."""
    u = u.withColumn("__bucket", F.date_trunc(unit, F.col("__ts")))
    w_in = Window.partitionBy("__key", "__bucket").orderBy(*order)
    if direction == "backward":
        w_in = w_in.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        within = F.last("__r", ignorenulls=True).over(w_in)
        pick = F.max_by
        carry_frame = (Window.unboundedPreceding, -1)
    else:
        w_in = w_in.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        within = F.first("__r", ignorenulls=True).over(w_in)
        pick = F.min_by
        carry_frame = (1, Window.unboundedFollowing)
    flagged = u.withColumn("__in", within)

    # Per-(key, bucket) summary: the boundary right row of the bucket
    # in (ts, side, tiebreak) order — max_by (backward: latest) or
    # min_by (forward: earliest) over the same ordering the window
    # uses. One row per key-bucket; a hot key with B buckets costs B
    # rows through the carry window, not its full row count.
    bucket_edge = (
        u.where(F.col("__side") != l_side)
        .groupBy("__key", "__bucket")
        .agg(pick("__r", F.struct(*order)).alias("__edge_r"))
    )
    # Bucket spine from BOTH sides (left rows may sit in buckets with
    # no right rows — the carry must still reach them).
    spine = u.select("__key", "__bucket").distinct()
    w_carry = (
        Window.partitionBy("__key")
        .orderBy("__bucket")
        .rowsBetween(*carry_frame)
    )
    carried = (
        F.last("__edge_r", ignorenulls=True).over(w_carry)
        if direction == "backward"
        else F.first("__edge_r", ignorenulls=True).over(w_carry)
    )
    carry = (
        spine.join(bucket_edge, ["__key", "__bucket"], "left")
        .withColumn("__carry", carried)
        .select("__key", "__bucket", "__carry")
    )
    return (
        flagged.join(carry, ["__key", "__bucket"], "left")
        .withColumn(out_col, F.coalesce("__in", "__carry"))
        .where(F.col("__side") == l_side)
    )
