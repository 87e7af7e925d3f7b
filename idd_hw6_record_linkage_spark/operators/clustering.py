"""Transitive clustering: connected components over match edges.

The reference emits raw matched pairs and stops (two-source linkage,
record_linkage.py:528-536); the north rule requires explicit entity
clusters, i.e. connected components. Implemented as the alternating
large-star / small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) expressed purely as
DataFrame joins + groupBy-min — O(log n) rounds. Crucially there is no
``collect_set`` of neighborhoods: a mega-hub node (web-scale skew)
never materializes its adjacency list in one task; the per-node min is
a partial-aggregatable ``min()`` and the emit step is a join, which
AQE can skew-split. ``localCheckpoint`` per iteration cuts lineage
(SURVEY §4 'iterative convergence').

Node ids are strings (urls); the deterministic cluster representative
is the lexicographic min id, so results are reproducible across
parallelism levels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """For every node u, connect each strictly-larger neighbor v to
    m(u) = min(N(u) ∪ {u})."""
    nbrs = edges.select("u", "v").unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = nbrs.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("mn", "u").alias("m"))
    # No dropDuplicates here: duplicate edges are harmless to every
    # downstream min-aggregation, _small_star dedups its output each
    # round anyway, and the extra exchange was one of six shuffle
    # stages per CC iteration (pure fixed overhead on the post-initial
    # iterations' small edge sets).
    return (
        nbrs.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges toward smaller ids; connect every smaller neighbor
    (and u itself) to m(u) = min(N(u))."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    via_nbrs = (
        oriented.join(mins, "u")
        .where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    via_self = mins.select(F.col("u"), F.col("m").alias("v"))
    return via_nbrs.unionByName(via_self).dropDuplicates(["u", "v"])


def _edge_signature(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(edges: DataFrame, max_iter: int = 25) -> DataFrame:
    """edges(id_l, id_r) → assignments(id, component) where component
    is the min id of the connected component. Covers nodes appearing
    in edges; union in singletons at the call site."""
    cur = (
        edges.select(F.col("id_l").alias("u"), F.col("id_r").alias("v"))
        .where(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
        .localCheckpoint()
    )
    prev_sig = None
    for _ in range(max_iter):
        # Eager checkpoint, deliberately: a lazy one (materialized by
        # the signature job) measured SLOWER end-to-end for consumers
        # of the final assignment — downstream jobs re-derived part of
        # the un-finalized checkpoint — while the eager form pins each
        # round's edge set once.
        cur = _small_star(_large_star(cur)).localCheckpoint()
        sig = _edge_signature(cur)
        if sig == prev_sig:
            break
        prev_sig = sig
    # Converged: stars (member u → component-min v).
    members = cur.select(F.col("u").alias("id"), F.col("v").alias("component"))
    roots = cur.select(F.col("v").alias("id"), F.col("v").alias("component"))
    return (
        members.unionByName(roots)
        .groupBy("id")
        .agg(F.min("component").alias("component"))
    )


def clusters_from_edges(
    edges: DataFrame, all_ids: DataFrame, id_col: str = "id"
) -> DataFrame:
    """Full cluster assignment including singletons:
    (url, entity_id) with entity_id = min url of the component."""
    comp = connected_components(edges)
    return (
        all_ids.select(F.col(id_col).alias("id"))
        .join(comp, "id", "left")
        .select(
            F.col("id").alias("url"),
            F.coalesce("component", "id").alias("entity_id"),
        )
    )


def cluster_size_stats(clusters: DataFrame,
                       cluster_col: str = "entity_id") -> DataFrame:
    """Cluster-size histogram over a cluster assignment:
    (cluster_size, n_clusters) — the dedup run's shape summary
    (singleton share, the mega-cluster tail a runaway threshold
    produces). Two groupBy aggregations, both map-side combined; the
    second runs over one row per cluster, so the histogram costs one
    shuffle of the assignment table at any scale."""
    sizes = clusters.groupBy(cluster_col).agg(
        F.count("*").alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count("*").alias("n_clusters")
    )


def triangle_support(
    edges: DataFrame, id_l: str = "id_l", id_r: str = "id_r"
) -> DataFrame:
    """Per-edge triangle support over an undirected edge set: for every
    canonical edge (a < b), the number of triangles it belongs to —
    the standard ER match-graph audit signal. A match edge supported
    by zero triangles is a BRIDGE: nothing else corroborates it, and
    if it is a false positive it alone glues two entities together
    (the failure mode cluster_quality_audit's min-degree flag sees
    only after the damage). Edges in many triangles are corroborated
    by their neighborhood.

    Returns the full canonical edge set with ``n_triangles``
    (0 for bridges). Algorithm: degree-ordered wedge counting
    (Suri & Vassilvitskii, WWW'11 — 'Counting Triangles and the Curse
    of the Last Reducer'): orient every edge from the (degree, id)-
    smaller endpoint to the larger, form wedges only at each triangle's
    lowest-order apex, and close them with a join back against the
    oriented edges. A degree-d hub emits O(d) oriented edges but only
    wedges over its HIGHER-degree neighbors, so the classic skew bomb —
    a mega-hub exploding into d² wedges — is bounded: every wedge
    apex has the minimum degree of its triangle. Three shuffles
    (degree agg, wedge self-join, closing join); the per-edge counts
    are one more hash aggregate over found triangles, never a
    collect_set of neighborhoods.
    """
    # localCheckpoint (eager): `e` is consumed four times (two degree
    # scans, the orientation join, the final left join) and `o` three
    # times (both wedge sides + the closing join). Without
    # materialization every reference re-executes the caller's whole
    # upstream plan — for the match-edge graph that is the blocked
    # pair join + comparator scoring, and the r05 physical plan held
    # 64 scans of the same parquet. The edge set is orders of
    # magnitude smaller than the upstream pair computation at any
    # scale, so materializing it is the cheap side of the trade.
    e = (
        edges.select(
            F.least(id_l, id_r).alias("a"), F.greatest(id_l, id_r).alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    ed = e.join(da, "a").join(db, "b")
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    o = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("deg_b")).otherwise(F.col("deg_a")).alias("deg_v"),
    ).localCheckpoint(eager=True)
    o1 = o.select(F.col("u"), F.col("v").alias("v1"), F.col("deg_v").alias("d1"))
    o2 = o.select(F.col("u"), F.col("v").alias("v2"), F.col("deg_v").alias("d2"))
    wedges = o1.join(o2, "u").where(
        (F.col("d1") < F.col("d2"))
        | ((F.col("d1") == F.col("d2")) & (F.col("v1") < F.col("v2")))
    )
    tris = wedges.join(
        o.select(F.col("u").alias("v1"), F.col("v").alias("v2")),
        ["v1", "v2"],
    ).select("u", "v1", "v2")
    tri_edges = (
        tris.select(
            F.explode(
                F.array(
                    F.array(F.least("u", "v1"), F.greatest("u", "v1")),
                    F.array(F.least("u", "v2"), F.greatest("u", "v2")),
                    F.array(F.least("v1", "v2"), F.greatest("v1", "v2")),
                )
            ).alias("pair")
        )
        .select(F.col("pair")[0].alias("a"), F.col("pair")[1].alias("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_triangles"))
    )
    return (
        e.join(tri_edges, ["a", "b"], "left")
        .select(
            F.col("a").alias("id_l"),
            F.col("b").alias("id_r"),
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
        )
    )


def filter_weak_bridges(
    edges: DataFrame,
    score_col: str = "score",
    min_bridge_score: float = 0.8,
) -> DataFrame:
    """Precision repair for transitive clustering: drop match edges
    that are BOTH uncorroborated (zero triangle support — nothing else
    in the neighborhood confirms them) AND weak (score below
    ``min_bridge_score``). Transitive closure's known failure mode is
    a single borderline false positive gluing two real entities into
    one mega-cluster; a high-score bridge or any edge inside a
    triangle survives, so well-supported chains and confident 1:1
    links are untouched. Returns the kept canonical (id_l, id_r)
    edges — feed them to :func:`clusters_from_edges`.

    Scale shape: :func:`triangle_support` (degree-oriented wedge
    counting) + one equi-join back to the scored edges; no new
    shuffle class beyond the triangle count itself.
    """
    tri = triangle_support(edges.select("id_l", "id_r"))
    scored = edges.select(
        F.least("id_l", "id_r").alias("id_l"),
        F.greatest("id_l", "id_r").alias("id_r"),
        F.col(score_col).alias("__score"),
    ).groupBy("id_l", "id_r").agg(F.max("__score").alias("__score"))
    return (
        tri.join(scored, ["id_l", "id_r"])
        .where(
            (F.col("n_triangles") > 0)
            | (F.col("__score") >= F.lit(float(min_bridge_score)))
        )
        .select("id_l", "id_r")
    )
