"""Batch record retraction: remove records from an EXISTING clustered
corpus and repair only the clusters they touched — the deletion
counterpart to :mod:`attach` (batch incremental additions). The
production trigger is compliance deletion (GDPR/CCPA erasure) and
source retraction: a record must leave the resolved corpus NOW, and
re-running all-pairs linkage over petabytes to honor one deletion is
not an option.

Removing records can only SPLIT components, never merge them (the
filtered match graph is a subgraph), so clusters containing no removed
record are provably untouched — their assignment rows pass through
unchanged — and only the affected components re-run connected
components, on their own remaining edges. With min-id labels
(``clustering.clusters_from_edges``'s convention) the output is
VALUE-IDENTICAL to a from-scratch re-clustering of the filtered edge
set over the remaining ids: untouched components keep their min id by
definition, re-clustered fragments get min-id labels from the same
convention, and labels never collide across disjoint node sets. That
equivalence is this operator's contract (asserted by its oracle and
tests), which requires the input assignment to carry min-id labels;
an assignment from another labeling scheme still splits correctly but
keeps its foreign labels only on untouched clusters.

Scale shape: two semi/anti-joins on the cluster label (shuffle keys =
entity ids), two semi/anti-joins picking the affected edge subgraph,
then CC over ONLY that subgraph — cost tracks |affected components|,
not |corpus|. A deletion batch touching k clusters of bounded size
runs in near-constant graph work regardless of corpus size; the
unavoidable full-table pass is the anti-join that drops the removed
rows themselves, which is a scan, not a shuffle of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.operators.clustering import (
    clusters_from_edges,
)

__all__ = ["retract_records"]


def retract_records(
    clusters: DataFrame,
    edges: DataFrame,
    removed: DataFrame,
    id_col: str = "url",
    cluster_col: str = "entity_id",
    l_col: str = "id_l",
    r_col: str = "id_r",
) -> DataFrame:
    """(id_col, cluster_col) over the corpus minus ``removed`` —
    value-identical to ``clusters_from_edges`` on the filtered graph,
    at the cost of the affected subgraph only.

    ``clusters`` is the current assignment (min-id labels), ``edges``
    the match edges that produced it, ``removed`` the ids to erase
    (one column ``id_col``; extra columns ignored; ids absent from
    the corpus are ignored — retraction is idempotent).
    """
    rm = removed.select(F.col(id_col)).dropDuplicates([id_col])
    affected = (
        clusters.join(rm, id_col, "leftsemi")
        .select(cluster_col)
        .dropDuplicates([cluster_col])
    )
    untouched = clusters.join(affected, cluster_col, "leftanti").select(
        id_col, cluster_col
    )
    remaining = (
        clusters.join(affected, cluster_col, "leftsemi")
        .join(rm, id_col, "leftanti")
        .select(id_col)
    )
    sub_edges = (
        edges.select(F.col(l_col).alias("id_l"), F.col(r_col).alias("id_r"))
        .join(remaining.withColumnRenamed(id_col, "id_l"), "id_l", "leftsemi")
        .join(remaining.withColumnRenamed(id_col, "id_r"), "id_r", "leftsemi")
    )
    repaired = clusters_from_edges(
        sub_edges, remaining, id_col=id_col
    ).withColumnsRenamed({"url": id_col, "entity_id": cluster_col})
    return untouched.unionByName(repaired)
