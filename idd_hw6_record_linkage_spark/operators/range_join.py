"""Range join (point-in-interval) — with as-of (operators/asof.py)
the second classic temporal join Spark has no native operator for.
Naively it is an inequality join, which Spark executes as
BroadcastNestedLoop/Cartesian — quadratic and forbidden in this
engine (plan-audited). The scalable form is bucketize-and-filter:

- points get ONE bucket: floor(ts / bucket);
- intervals explode to EVERY bucket they overlap (bounded by
  ceil(interval_len / bucket) + 1 rows — pick ``bucket_seconds`` near
  the typical interval length so the fan-out is ~2);
- equi-join on (key, bucket) — hash join, shuffles on both sides —
  then the exact predicate ``start <= ts <= end`` filters
  false bucket neighbors.

Each matching (point, interval) pair joins in exactly ONE bucket (the
point's), so no post-join dedup is needed — the join IS exact.
Per-key+bucket skew follows the same story as blocking keys: a hot
(key, bucket) cell is a real data hotspot; AQE skew-join splits it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["point_in_interval_join"]


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    ts: str,
    start: str,
    end: str,
    bucket_seconds: int = 86_400,
) -> DataFrame:
    """All (point, interval) pairs with the same ``key`` and
    ``start <= ts <= end`` (inclusive both ends): point columns +
    a non-null ``interval`` struct per match (inner-join semantics —
    points matching k intervals appear k times, points matching none
    are absent). NULL timestamps/bounds and empty (end < start)
    intervals never match."""
    if bucket_seconds <= 0:
        raise ValueError(f"bucket_seconds must be positive: {bucket_seconds}")

    def _epoch(c: str) -> F.Column:
        return F.unix_timestamp(F.col(c).cast("timestamp"))

    p = points.where(F.col(ts).isNotNull()).select(
        F.col(key).alias("__key"),
        F.floor(_epoch(ts) / bucket_seconds).alias("__b"),
        F.col(ts).alias("__ts"),
        F.struct(*[F.col(c) for c in points.columns]).alias("__l"),
    )
    iv = (
        intervals.where(
            F.col(start).isNotNull()
            & F.col(end).isNotNull()
            & (F.col(end) >= F.col(start))
        )
        .select(
            F.col(key).alias("__key"),
            F.explode(
                F.sequence(
                    F.floor(_epoch(start) / bucket_seconds),
                    F.floor(_epoch(end) / bucket_seconds),
                )
            ).alias("__b"),
            F.col(start).alias("__start"),
            F.col(end).alias("__end"),
            F.struct(*[F.col(c) for c in intervals.columns]).alias(
                "interval"
            ),
        )
    )
    out = p.join(iv, ["__key", "__b"]).where(
        (F.col("__ts") >= F.col("__start")) & (F.col("__ts") <= F.col("__end"))
    )
    return out.select("__l.*", "interval")
