"""Match resolution: turn a scored candidate-pair table into a
one-to-one linkage. The reference stops at thresholded pair scores
(record_linkage.py:588-693 keeps every pair over 0.5); real two-source
linkage usually needs each record matched to at most ONE counterpart
(a Craigslist listing resolves to one US-Used-Cars record, not five).

:func:`mutual_best_match` implements symmetric best-match selection:
a pair (l, r) survives iff r is l's highest-scoring candidate AND l is
r's highest-scoring candidate — the first round of greedy/stable
matching, and the standard scalable 1:1 post-filter (full greedy
matching is inherently sequential: every acceptance changes the
remaining candidate set; mutual-best is its embarrassingly-parallel
approximation and never produces a pair greedy would reject first).

Scale shape: two window shuffles (one partitioned by each side), both
on record ids — no collect, no driver loop, no broadcast assumption.
Ties are broken deterministically (higher score, then smaller partner
id), so results are engine-reproducible and the contract query is
value-exact vs DuckDB. Hot-key caveat: a record with millions of
candidates serializes its own window partition; upstream block caps
(`blocking.cap_blocks`) bound candidate fan-out long before that —
the same contract every window-based operator in this repo relies on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["mutual_best_match"]


def mutual_best_match(
    scored: DataFrame,
    left_col: str,
    right_col: str,
    score_col: str,
) -> DataFrame:
    """Keep only pairs where each side is the other's rank-1 candidate
    by (score DESC, partner id ASC). Returns the input schema
    unchanged; each surviving left id and right id appears exactly
    once. NULL scores rank last (never selected over a scored rival);
    a side whose only candidates have NULL scores can still match if
    the choice is mutual — callers wanting to drop NULL-scored pairs
    filter first."""
    wl = Window.partitionBy(left_col).orderBy(
        F.col(score_col).desc_nulls_last(), F.col(right_col).asc()
    )
    wr = Window.partitionBy(right_col).orderBy(
        F.col(score_col).desc_nulls_last(), F.col(left_col).asc()
    )
    return (
        scored.withColumn("__rank_l", F.row_number().over(wl))
        .withColumn("__rank_r", F.row_number().over(wr))
        .where((F.col("__rank_l") == 1) & (F.col("__rank_r") == 1))
        .drop("__rank_l", "__rank_r")
    )
