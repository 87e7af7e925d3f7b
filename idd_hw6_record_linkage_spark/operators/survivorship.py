"""Survivorship ("golden record"): collapse each resolved entity
cluster into one canonical record by per-column merge rules. This is
the stage AFTER clustering that every production MDM/ER pipeline runs
and the reference omits entirely (record_linkage.py stops at cluster
assignments) — without it a linkage result can't feed a downstream
consumer expecting one row per entity.

Rules (per output column):

- ``"min"`` / ``"max"``      — extreme non-null value.
- ``"sum"`` / ``"avg"``      — numeric aggregate over non-nulls.
- ``"longest"``              — the longest non-null string; ties break
                               to the lexicographically smallest, so
                               the survivor is deterministic.
- ``"any"``                  — deterministic representative: the
                               minimum non-null value (NOT Spark's
                               ``first``, which is partition-order-
                               dependent and irreproducible).
- ``"mode"``                 — most frequent non-null value; ties
                               break to the smallest value.

Scale shape: every rule except ``mode`` is a plain aggregate —  ALL of
them compute in ONE map-side-combinable groupBy on the cluster id
(longest/any ride a max/min over a (len, value)/value ordering via
max_by / min / struct comparison — no window, no self-join). ``mode``
genuinely needs per-(cluster, value) counts, so each mode column adds
one extra groupBy + a per-cluster min_by selection, then joins back on
the cluster id (shuffle join; the golden table is one row per entity —
usually small, but NEVER assumed broadcastable). A cluster with a
billion members is just a big group in a hash aggregate — partial
aggregation absorbs it; no rule materializes a per-cluster row list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["consolidate_clusters"]

_PLAIN = {"min", "max", "sum", "avg", "longest", "any"}


def _plain_agg(rule: str, col: str) -> F.Column:
    c = F.col(col)
    if rule == "min":
        return F.min(c).alias(col)
    if rule == "max":
        return F.max(c).alias(col)
    if rule == "sum":
        return F.sum(c).alias(col)
    if rule == "avg":
        return F.avg(c).alias(col)
    if rule == "any":
        return F.min(c).alias(col)
    # longest: max over (length, reversed-tiebreak) — Spark's max_by is
    # non-deterministic on ties, so order by a struct instead: length
    # first; among equal lengths the SMALLEST string must win, and
    # struct comparison can't mix asc/desc, so take min over
    # (-length, value). Nulls drop out of min/max by definition.
    return F.min(
        F.when(c.isNotNull(), F.struct((-F.length(c)).alias("nl"), c.alias("v")))
    )["v"].alias(col)


def consolidate_clusters(
    df: DataFrame,
    cluster_col: str,
    rules: dict[str, str],
) -> DataFrame:
    """One row per ``cluster_col`` value with each rule column merged
    per its rule (see module docstring). Unlisted columns are dropped
    — a golden record only carries fields someone decided how to
    merge. Raises on unknown rules or on a rule for ``cluster_col``
    itself."""
    bad = {c: r for c, r in rules.items() if r not in _PLAIN | {"mode"}}
    if bad:
        raise ValueError(f"unknown survivorship rules: {bad}")
    if cluster_col in rules:
        raise ValueError(f"{cluster_col!r} is the group key, not a rule column")

    plain = [(c, r) for c, r in rules.items() if r in _PLAIN]
    modes = [c for c, r in rules.items() if r == "mode"]

    aggs = [_plain_agg(r, c) for c, r in plain]
    golden = (
        df.groupBy(cluster_col).agg(*aggs)
        if aggs
        else df.select(cluster_col).distinct()
    )
    for col in modes:
        counts = (
            df.where(F.col(col).isNotNull())
            .groupBy(cluster_col, col)
            .agg(F.count("*").alias("__n"))
        )
        # most frequent, ties to smallest value: min over
        # (-count, value) — same struct trick as `longest`.
        best = counts.groupBy(cluster_col).agg(
            F.min(F.struct((-F.col("__n")).alias("nn"), F.col(col).alias("v")))[
                "v"
            ].alias(col)
        )
        golden = golden.join(best, cluster_col, "left")
    return golden.select(cluster_col, *rules.keys())
