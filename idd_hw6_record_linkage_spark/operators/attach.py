"""Batch incremental linkage: attach NEW records to an EXISTING
clustered corpus without re-running all-pairs linkage. The production
daily-ingest pattern — yesterday's corpus is resolved and golden,
today's delta is blocked/scored against it only (candidate cost ~
|delta| × avg-block, not |corpus|²). Complements the streaming
incremental path (streaming/ingest.py) with the batch equivalent.

Semantics (attach-only, documented): each new record joins the
best-scoring existing cluster at/above the threshold, else founds its
own singleton entity labeled by its own id — the same min-label
convention as ``clustering.clusters_from_edges``, so a later full
re-clustering converges to the same labels. Matches BETWEEN two new
records are deliberately out of scope for this operator (they arrive
in the pair table of the next full run, or the caller unions the
delta's own linkage edges); attach-only keeps the operation
idempotent and single-pass.

Scale shape: one max-aggregate per (new record, candidate cluster),
one window rank partitioned by the new record id (bounded fan-out:
upstream block caps bound each new record's candidate count), one
left join over the delta — no step touches the existing corpus beyond
the candidate pairs the caller's blocking produced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["attach_to_clusters"]


def attach_to_clusters(
    scored: DataFrame,
    clusters: DataFrame,
    new_ids: DataFrame,
    threshold: float,
    new_col: str = "id_new",
    old_col: str = "id_old",
    score_col: str = "score",
    id_col: str = "url",
    cluster_col: str = "entity_id",
) -> DataFrame:
    """(id_col, cluster_col, attach_score, attached) — one row per row
    of ``new_ids``. ``scored`` carries (new_col, old_col, score_col)
    pairs from the caller's blocking+scoring of delta × corpus;
    ``clusters`` maps existing ids to entities. A new record's score
    against a cluster is the MAX over that cluster's members
    (single-link attachment); ties across clusters break to the
    smallest entity label. Unmatched records found their own entity
    (entity = own id, attach_score NULL, attached false)."""
    cand = (
        scored.where(F.col(score_col) >= threshold)
        .join(
            clusters.select(
                F.col(id_col).alias(old_col), cluster_col
            ),
            old_col,
        )
        .groupBy(new_col, cluster_col)
        .agg(F.max(score_col).alias("attach_score"))
    )
    w = Window.partitionBy(new_col).orderBy(
        F.col("attach_score").desc(), F.col(cluster_col).asc()
    )
    best = (
        cand.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .drop("__rk")
    )
    return (
        new_ids.select(F.col(id_col))
        .join(
            best.withColumnsRenamed({new_col: id_col}), id_col, "left"
        )
        .select(
            id_col,
            F.coalesce(cluster_col, id_col).alias(cluster_col),
            "attach_score",
            F.col(cluster_col).isNotNull().alias("attached"),
        )
    )
