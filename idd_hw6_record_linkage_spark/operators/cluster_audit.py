"""Cluster-quality audit: transitive closure is the standard last step
of linkage (operators/clustering.py), and its standard failure mode is
over-merging — one spurious edge glues two real entities into a single
cluster. The reference audits pair-level mistakes (3_audit_models.py's
impossible-match rate) but has nothing at the cluster level; this
operator closes that gap with the two classic structural signals:

- **density** = n_edges / C(n_members, 2) — a genuine entity's cluster
  is near-complete (every member pair matched); a chain glued by
  transitivity is sparse.
- **min_degree** — a member attached by a single edge is the classic
  bridge suspect; min_degree == 1 in a large cluster means one pair
  decision away from a split.

Scale shape: everything is hash aggregates on the cluster id / member
id — member counts (one groupBy), edge counts per cluster (edges map
to their endpoint's cluster via ONE shuffle join on the id; endpoints
share a cluster by construction of transitive closure, so joining the
left endpoint suffices), degrees (explode both endpoints, one
groupBy), min-degree per cluster (one groupBy). No windows, no
quadratic step — auditing a billion-edge clustering costs a few
pair-table-sized shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cluster_quality", "constraint_check", "cannot_link_violations"]


def constraint_check(
    clusters: DataFrame,
    pairs: DataFrame,
    id_col: str = "url",
    cluster_col: str = "entity_id",
    left_col: str = "id_l",
    right_col: str = "id_r",
) -> DataFrame:
    """Annotate cannot-link constraint ``pairs`` with both records'
    cluster assignments and a ``violated`` flag (same non-null cluster
    on both sides). Cannot-link constraints are the standard guard
    against transitive over-merge: records a business rule forbids
    from co-resolving (two records of the same source in a dedup run,
    two different VINs, two distinct validated SSNs). Returning every
    constraint — not just violations — keeps the output a stable audit
    artifact whose row count equals the constraint count.

    Shape at scale: two hash joins of the constraint table against the
    assignment table on the record id; the assignment side shuffles
    once per join, the (much smaller) constraint side rides along.
    Unmatched ids keep NULL clusters and are never violations."""
    a = clusters.select(
        F.col(id_col).alias(left_col), F.col(cluster_col).alias("cluster_l")
    )
    b = clusters.select(
        F.col(id_col).alias(right_col), F.col(cluster_col).alias("cluster_r")
    )
    return (
        pairs.join(a, left_col, "left")
        .join(b, right_col, "left")
        .withColumn(
            "violated",
            # All three conjuncts so an unmatched side yields false,
            # not three-valued NULL.
            F.col("cluster_l").isNotNull()
            & F.col("cluster_r").isNotNull()
            & (F.col("cluster_l") == F.col("cluster_r")),
        )
    )


def cannot_link_violations(
    clusters: DataFrame,
    pairs: DataFrame,
    id_col: str = "url",
    cluster_col: str = "entity_id",
    left_col: str = "id_l",
    right_col: str = "id_r",
) -> DataFrame:
    """Only the violated constraints (see :func:`constraint_check`) —
    the rows a production run routes to cluster splitting / review."""
    chk = constraint_check(
        clusters, pairs, id_col, cluster_col, left_col, right_col
    )
    return chk.where(F.col("violated")).drop("violated")


def cluster_quality(
    clusters: DataFrame,
    edges: DataFrame,
    id_col: str = "url",
    cluster_col: str = "entity_id",
    min_density: float = 1.0,
) -> DataFrame:
    """(cluster_col, n_members, n_edges, density, min_degree, suspect)
    for every MULTI-member cluster (singletons have no pair decisions
    to audit). ``edges`` carries (id_l, id_r); duplicate edges are
    collapsed. ``suspect`` flags clusters below ``min_density`` OR
    held together by a degree-1 member when larger than one pair —
    the review queue a production linkage feeds back to labeling.

    ``density`` is exact and deterministic: an integer edge count over
    an integer pair count, one division."""
    e = edges.select("id_l", "id_r").distinct()
    members = clusters.groupBy(cluster_col).agg(
        F.count("*").cast("long").alias("n_members")
    )
    asg = clusters.select(
        F.col(id_col).alias("id_l"), cluster_col
    )
    e_cl = e.join(asg, "id_l")
    edge_counts = e_cl.groupBy(cluster_col).agg(
        F.count("*").cast("long").alias("n_edges")
    )
    degrees = (
        e.select(F.col("id_l").alias("id"))
        .unionAll(e.select(F.col("id_r").alias("id")))
        .groupBy("id")
        .agg(F.count("*").cast("long").alias("__deg"))
    )
    min_deg = (
        clusters.select(F.col(id_col).alias("id"), cluster_col)
        .join(degrees, "id")
        .groupBy(cluster_col)
        .agg(F.min("__deg").alias("min_degree"))
    )
    return (
        members.where(F.col("n_members") >= 2)
        .join(edge_counts, cluster_col, "left")
        .join(min_deg, cluster_col, "left")
        .select(
            cluster_col,
            "n_members",
            F.coalesce("n_edges", F.lit(0)).cast("long").alias("n_edges"),
            F.coalesce("min_degree", F.lit(0))
            .cast("long")
            .alias("min_degree"),
        )
        .withColumn(
            "density",
            F.round(
                F.col("n_edges")
                / (F.col("n_members") * (F.col("n_members") - 1) / 2.0),
                6,
            ),
        )
        .select(
            cluster_col, "n_members", "n_edges", "density", "min_degree"
        )
        .withColumn(
            "suspect",
            (F.col("density") < min_density)
            | ((F.col("min_degree") <= 1) & (F.col("n_members") > 2)),
        )
    )
