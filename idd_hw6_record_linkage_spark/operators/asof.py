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
when one side is tiny. Hot keys serialize through their window
partition — at web scale, sub-bucket hot keys by a coarse time range
first (the window is order-preserving within each range, and only
range boundaries need a second pass).

Ties inside the right side (two right rows with the SAME key and
timestamp) resolve to the one latest in (ts, tiebreak) order if
``right_tiebreak`` is given, else arbitrarily — same contract as
DuckDB ASOF JOIN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join_backward"]


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Left rows + a nullable ``asof`` struct holding the matched
    right row (all right columns); NULL when no right row at-or-before
    exists for the key. NULL-timestamp rows never match (left) and
    never get matched (right)."""
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
    order = [F.col("__ts"), F.col("__side")]
    if right_tiebreak is not None:
        # right rows carry the tiebreak inside __r; left rows are NULL
        # there and sort first among equals, which is irrelevant (the
        # left row is the probe, not a candidate).
        order.append(F.col("__r").getField(right_tiebreak))
    w = (
        Window.partitionBy("__key")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn(
        "asof", F.last("__r", ignorenulls=True).over(w)
    ).where(F.col("__side") == 1)
    return matched.select("__l.*", "asof")
