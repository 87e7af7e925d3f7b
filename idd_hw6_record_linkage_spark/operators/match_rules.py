"""Deterministic match-rule waterfall — the MDM-style rule cascade.

Production entity-resolution systems almost always run a CASCADE of
deterministic rules before (or instead of) a probabilistic scorer:
"exact key match, else tight edit distance on the name, else strong
token overlap" — with per-pair PROVENANCE of which rule fired, because
downstream consumers trust rule-1 matches differently from rule-3
matches and audits ask "why did these two records merge?". The
reference's pipeline has a single-threshold decision
(record_linkage.py's fixed comparator thresholds); the waterfall is
the standard generalization every MDM / master-data product ships.

Spark-first shape: the whole cascade is ONE map-only CASE expression
over the already-blocked candidate-pair table — no extra shuffle, no
UDF, whole-stage codegen. First-true-wins semantics are exactly
``F.when(...).when(...)`` chaining, so rule priority is the list
order, and the same chain is trivially SQL-expressible (the contract
oracle recomputes it as a CASE in DuckDB).

At 100 TB: rules are evaluated on the pair stream produced by
blocking — the cascade adds zero shuffles; per-rule audit counts
(:func:`rule_stats`) are one map-side-combined aggregate whose state
is bounded by the number of rules (+1 for the no-match bucket).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["apply_match_rules", "rule_stats"]


def apply_match_rules(
    pairs: DataFrame,
    rules: list[tuple[str, Column]],
    rule_col: str = "matched_rule",
    rank_col: str = "rule_rank",
) -> DataFrame:
    """Append first-true-wins provenance columns to a candidate-pair
    DataFrame.

    ``rules`` is an ORDERED list of (name, boolean Column) — earlier
    rules take precedence, mirroring the waterfall semantics. Pairs
    matching no rule get ``rule_col`` NULL and ``rank_col`` NULL (a
    pair the cascade declines is a non-match, not a zeroth rule).
    Rule names must be unique; a rule whose predicate evaluates NULL
    (e.g. a comparator over a NULL attribute) is treated as not
    matching — exactly SQL CASE semantics, so the oracle cannot
    diverge on null-bearing data.
    """
    if not rules:
        raise ValueError("rules must be a non-empty ordered list")
    names = [n for n, _ in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {names}")
    for col in (rule_col, rank_col):
        if col in pairs.columns:
            raise ValueError(f"column {col!r} already exists on pairs")

    rule_expr: Column | None = None
    rank_expr: Column | None = None
    for rank, (name, pred) in enumerate(rules, start=1):
        if rule_expr is None:
            rule_expr = F.when(pred, F.lit(name))
            rank_expr = F.when(pred, F.lit(rank))
        else:
            rule_expr = rule_expr.when(pred, F.lit(name))
            rank_expr = rank_expr.when(pred, F.lit(rank))
    return pairs.withColumn(rule_col, rule_expr).withColumn(
        rank_col, rank_expr.cast("int")
    )


def rule_stats(
    pairs_with_rules: DataFrame, rule_col: str = "matched_rule"
) -> DataFrame:
    """Per-rule audit counts (NULL group = pairs no rule claimed) —
    one map-side-combined aggregate, state bounded by the rule count."""
    return pairs_with_rules.groupBy(rule_col).agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
