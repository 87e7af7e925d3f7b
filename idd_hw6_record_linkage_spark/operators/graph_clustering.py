"""Alternative match-graph clusterings: star and correlation-pivot.

Connected components (operators.clustering) is recall-greedy: one
spurious edge welds two entities together. The ER literature's
standard answers (Hassanzadeh, Chiang, Lee & Miller, VLDB 2009,
"Framework for Evaluating Clustering Algorithms in Duplicate
Detection") are families that pick CLUSTER CENTERS and refuse to
chain through them. This module ships the two center-picking families
next to the bridge-safe CC variant (clustering.py / cluster_audit.py
already cover the CC side):

:func:`star_clusters` — Aslam, Pelekhov & Rus's star clustering, in
the deterministic ONE-ROUND parallel form: a node is a center iff it
beats every neighbor in the (degree DESC, id ASC) dominance order;
every non-center attaches to its best (highest-dominance) adjacent
center, or stays a singleton when no neighbor is a center. The
sequential algorithm peels centers greedily by degree; the one-round
form keeps its local character (a center is a local dominance
maximum) while being embarrassingly parallel and, crucially for the
contract, expressible identically in any SQL engine — no iteration.
Two adjacent centers are impossible (one would beat the other), and
satellites never chain: precision comes from every cluster being a
star of radius 1.

:func:`pivot_clusters` — correlation clustering by the pivot
algorithm (Ailon, Charikar & Newman, JACM 2008: expected 3-approx
for correlation clustering with a RANDOM pivot order), in the
round-synchronous parallel form (Chierichetti, Dalvi & Kumar, KDD
2014 prove O(log n) rounds suffice): the random permutation is a
DETERMINISTIC md5 rank (``md5(id) || '|' || id`` — reproducible
across engines, repartitioning and reruns, the same fate discipline
as operators.sampling), and each round every still-active node that
holds the minimum rank in its active neighborhood becomes a pivot
and absorbs its active neighbors. Adjacent pivots are impossible
(strict total order), so absorption is unambiguous; a node with
several pivot neighbors joins the minimum-rank one. ``rounds`` is
part of the operator's pinned semantics: after exactly that many
synchronous rounds, unsettled nodes become singletons — so a fixed
``rounds`` yields a value-exact cross-engine contract, while
``rounds=None`` iterates to convergence for production use.

Scale shape (both): degree/min-rank aggregations and edge joins are
hash shuffles on node ids — no collect_set of neighborhoods, no
driver loop except the bounded round counter; per-round
localCheckpoint cuts lineage exactly like connected_components. The
star assignment window partitions by satellite id and only ranks the
satellite's ADJACENT CENTERS (bounded by its degree); upstream block
caps bound degree itself (the standing contract every window-based
operator in this repo relies on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["star_clusters", "pivot_clusters"]


def _sym_edges(edges: DataFrame) -> DataFrame:
    """(u, v) symmetric, deduplicated, self-loop-free."""
    e = edges.select(
        F.col("id_l").cast("string").alias("u"),
        F.col("id_r").cast("string").alias("v"),
    ).where(F.col("u") != F.col("v"))
    return (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .dropDuplicates(["u", "v"])
    )


def star_clusters(
    edges: DataFrame, all_ids: DataFrame, id_col: str = "id"
) -> DataFrame:
    """One-round star clustering: (url, star_id, is_center). Centers
    are local maxima of the (degree DESC, id ASC) dominance order;
    satellites attach to their best adjacent center; nodes with no
    adjacent center (including isolated nodes) are their own
    centers.

    PRECONDITION: every edge endpoint must appear in ``all_ids``.
    Candidate/attached rows are derived from the adjacency (not the
    universe), so a foreign endpoint would be emitted as a satellite
    while the center/singleton fallback only covers universe rows —
    output ids would stop being a subset of ``all_ids``.
    (``pivot_clusters`` drops foreign endpoints naturally via its
    active-set joins; here the contract is on the caller, which every
    shipped call site satisfies: edges are always built from the same
    table as the universe.)"""
    nbrs = _sym_edges(edges)
    deg = nbrs.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    # (v, u, deg_v, deg_u) for every adjacency, both roles resolved.
    adj = (
        nbrs.select(F.col("u").alias("v"), F.col("v").alias("u"))
        .join(deg.select(F.col("u").alias("v"), F.col("deg").alias("deg_v")), "v")
        .join(deg.select("u", F.col("deg").alias("deg_u")), "u")
    )
    beats = (F.col("deg_u") > F.col("deg_v")) | (
        (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))
    )
    dominated = (
        adj.groupBy("v").agg(F.max(beats.cast("int")).alias("dom"))
    )
    universe = all_ids.select(F.col(id_col).cast("string").alias("v"))
    centers = (
        universe.join(dominated, "v", "left")
        .where(F.coalesce("dom", F.lit(0)) == 0)
        .select(F.col("v").alias("c"))
    )
    # Satellites rank their ADJACENT centers by dominance. (Two
    # adjacent centers are impossible — one would beat the other — so
    # a row with a center on the u side always has a satellite v.)
    cand = adj.join(centers.select(F.col("c").alias("u")), "u")
    w = Window.partitionBy("v").orderBy(
        F.col("deg_u").desc(), F.col("u").asc()
    )
    attached = (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(F.col("v").alias("url"), F.col("u").alias("star_id"))
        .withColumn("is_center", F.lit(False))
    )
    # Everyone else is their own star: true centers (is_center=True)
    # and dominated nodes with no adjacent center (singleton
    # fallback, is_center=False — they lost the dominance test).
    selves = (
        universe.join(
            attached.select(F.col("url").alias("v")), "v", "left_anti"
        )
        .join(centers.select(F.col("c").alias("v"), F.lit(True).alias("ic")),
              "v", "left")
        .select(
            F.col("v").alias("url"),
            F.col("v").alias("star_id"),
            F.coalesce("ic", F.lit(False)).alias("is_center"),
        )
    )
    return attached.unionByName(selves)


def pivot_clusters(
    edges: DataFrame,
    all_ids: DataFrame,
    id_col: str = "id",
    rounds: int | None = 4,
    max_iter: int = 50,
) -> DataFrame:
    """Round-synchronous pivot correlation clustering:
    (url, pivot_id). ``rounds`` fixed → leftovers after that many
    rounds become singletons (pinned cross-engine semantics);
    ``rounds=None`` → iterate until no node is active (capped at
    ``max_iter``)."""
    e = _sym_edges(edges).localCheckpoint()

    def rk(col):
        return F.concat(F.md5(col), F.lit("|"), col)

    active = (
        all_ids.select(F.col(id_col).cast("string").alias("id"))
        .withColumn("rk", rk(F.col("id")))
        .localCheckpoint()
    )
    out: list[DataFrame] = []
    n_rounds = rounds if rounds is not None else max_iter
    for _ in range(n_rounds):
        if active.isEmpty():
            break
        act_e = (
            e.join(active.select(F.col("id").alias("u")), "u")
            .join(
                active.select(
                    F.col("id").alias("v"), F.col("rk").alias("rk_v")
                ),
                "v",
            )
        )
        mn = act_e.groupBy("u").agg(F.min("rk_v").alias("mn"))
        pivots = (
            active.join(mn, active.id == mn.u, "left")
            .where(F.col("mn").isNull() | (F.col("rk") < F.col("mn")))
            .select("id", "rk")
        )
        out.append(
            pivots.select(
                F.col("id").alias("url"), F.col("id").alias("pivot_id")
            )
        )
        assigned = (
            act_e.join(
                pivots.select(F.col("id").alias("v")), "v"
            )
            .groupBy("u")
            .agg(F.min("rk_v").alias("prk"))
            .select(
                F.col("u").alias("url"),
                F.substring(F.col("prk"), 34, 1_000_000).alias("pivot_id"),
            )
        )
        out.append(assigned)
        settled = (
            pivots.select("id")
            .unionByName(assigned.select(F.col("url").alias("id")))
        )
        active = active.join(settled, "id", "left_anti").localCheckpoint()
    leftovers = active.select(
        F.col("id").alias("url"), F.col("id").alias("pivot_id")
    )
    res = leftovers
    for part in out:
        res = res.unionByName(part)
    return res
