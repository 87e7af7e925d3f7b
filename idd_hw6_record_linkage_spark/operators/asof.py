"""As-of join — the classic temporal operator Spark has no native
form of: for every left row, attach the latest right row whose
timestamp is at-or-before the left timestamp, per key (backward
direction, the ``pd.merge_asof`` / DuckDB ``ASOF JOIN`` semantics
with ``>=``).

Implementation is the union+window trick, fully native (no
``applyInPandas``/``merge_asof``, no per-group Python): tag both
sides, union, and take ``last(right_payload, ignorenulls=True)`` over
a per-key window ordered by (ts, side) with the right side sorting
first at equal timestamps — so an exactly-simultaneous right row
matches (at-or-*before*). ONE shuffle (the per-key window); the
alternative broadcast-range or bucketize-and-filter plans only win
when one side is tiny.

Hot keys: a mega-key (one domain = 10% of events) serializes through
a single window partition. ``coarse_bucket`` activates a two-pass
segmented scan (the same trick sampling.pack_shards uses for its
global prefix sum): pass 1 windows within (key, coarse time bucket)
— the hot key's rows now spread across as many partitions as it has
buckets — and pass 2 carries the last right row of each earlier
bucket forward over a per-key window on the (key, bucket) SUMMARY
table (one row per key-bucket, so the hot key costs B rows, not N).
Result-equality to the one-pass plan is asserted in
tests/test_asof_range.py with a planted hot key.

Ties inside the right side (two right rows with the SAME key and
timestamp) resolve to the one latest in (ts, tiebreak) order if
``right_tiebreak`` is given, else arbitrarily — same contract as
DuckDB ASOF JOIN.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

__all__ = ["asof_join_backward"]

_INTERNAL = ("__key", "__ts", "__side", "__l", "__r", "__bucket")


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
    """Every left row + a nullable ``out_col`` struct holding the
    matched right row (all right columns); NULL when no right row
    at-or-before exists for the key. NULL-timestamp left rows are
    RETAINED with ``out_col`` = NULL (they cannot match anything but
    this is a left-join-style operator — dropping them would be
    silent row loss); NULL-timestamp right rows never get matched.

    ``coarse_bucket``: optional hot-key mitigation — a ``date_trunc``
    unit ('day', 'hour', 'week', ...) applied to the timestamp. The
    per-key window becomes per-(key, bucket) plus a carry pass over
    the tiny per-bucket summary; results are identical to the
    one-pass plan for any bucket unit (asserted in tests).
    """
    if out_col in left.columns:
        raise ValueError(
            f"asof_join_backward: left already has a column named "
            f"{out_col!r} — pass out_col= a non-colliding name"
        )
    for c in _INTERNAL:
        if c in left.columns or c in right.columns:
            raise ValueError(
                f"asof_join_backward: column {c!r} is reserved internally"
            )
    asof_type = StructType(right.schema.fields)

    l2 = left.where(F.col(left_ts).isNotNull()).select(
        F.col(key).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    r2 = right.where(F.col(right_ts).isNotNull()).select(
        F.col(key).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in right.columns]).alias("__r"),
    )
    u = l2.unionByName(r2, allowMissingColumns=True)
    order: list[Column] = [F.col("__ts"), F.col("__side")]
    if right_tiebreak is not None:
        # right rows carry the tiebreak inside __r; left rows are NULL
        # there and sort first among equals, which is irrelevant (the
        # left row is the probe, not a candidate).
        order.append(F.col("__r").getField(right_tiebreak))

    if coarse_bucket is None:
        w = (
            Window.partitionBy("__key")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = u.withColumn(
            out_col, F.last("__r", ignorenulls=True).over(w)
        ).where(F.col("__side") == 1)
    else:
        matched = _two_pass(u, order, out_col, coarse_bucket)

    out = matched.select("__l.*", out_col)
    # NULL-timestamp left rows: retained, unmatched by definition.
    null_ts = left.where(F.col(left_ts).isNull()).withColumn(
        out_col, F.lit(None).cast(asof_type)
    )
    return out.unionByName(null_ts)


def _two_pass(
    u: DataFrame, order: list[Column], out_col: str, unit: str
) -> DataFrame:
    """Segmented as-of scan: window within (key, date_trunc(unit, ts)),
    then coalesce with the latest right row carried from strictly
    earlier buckets. Correct because date_trunc is monotone in ts:
    every right row in an earlier bucket is at-or-before every left
    ts in a later bucket, and any same-bucket match is later than any
    carried row — so coalesce(within_bucket, carry) is exactly the
    one-pass answer."""
    u = u.withColumn("__bucket", F.date_trunc(unit, F.col("__ts")))
    w_in = (
        Window.partitionBy("__key", "__bucket")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = u.withColumn("__in", F.last("__r", ignorenulls=True).over(w_in))

    # Per-(key, bucket) summary: the LAST right row of the bucket in
    # (ts, side, tiebreak) order — max_by over the same ordering the
    # window uses. One row per key-bucket; a hot key with B buckets
    # costs B rows through the carry window, not its full row count.
    bucket_last = (
        u.where(F.col("__side") == 0)
        .groupBy("__key", "__bucket")
        .agg(F.max_by("__r", F.struct(*order)).alias("__last_r"))
    )
    # Bucket spine from BOTH sides (left rows may sit in buckets with
    # no right rows — the carry must still reach them).
    spine = u.select("__key", "__bucket").distinct()
    w_carry = (
        Window.partitionBy("__key")
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        spine.join(bucket_last, ["__key", "__bucket"], "left")
        .withColumn("__carry", F.last("__last_r", ignorenulls=True).over(w_carry))
        .select("__key", "__bucket", "__carry")
    )
    return (
        within.join(carry, ["__key", "__bucket"], "left")
        .withColumn(out_col, F.coalesce("__in", "__carry"))
        .where(F.col("__side") == 1)
    )
