"""Blocking-scheme evaluation: given several candidate-pair sets from
competing blocking schemes, score each on the two classic axes —
reduction ratio (how much of the n^2 comparison space was avoided) and
pairs completeness (what fraction of true matches survived blocking) —
in ONE result DataFrame, one row per scheme. This distributes the
reference's model-selection step (3_audit_models.py ranks blocking
configs by downstream F1) to the blocking layer itself, where a scheme
can be rejected before a single comparator runs.

Unlike ``blocking.reduction_ratio`` / ``pairs_completeness`` (driver
floats for interactive use), everything here stays a DataFrame: per
scheme, pair and truth-overlap counts are one-row aggregates crossed
together — no corpus-sized collect, no assumption any pair set fits
anywhere. The truth table is consumed via a LEFT SEMI join per scheme
(never materialized per-pair flags), so a billion-pair scheme costs
one hash semi-join + count.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["scheme_metrics"]


def scheme_metrics(
    pairs_by_scheme: dict[str, DataFrame],
    truth: DataFrame,
    total_records: int,
) -> DataFrame:
    """(scheme, n_pairs, reduction_ratio, pairs_completeness), one row
    per entry of ``pairs_by_scheme``. Pair DataFrames must carry
    (id_l, id_r); duplicates are collapsed before counting so a scheme
    emitting a pair twice isn't penalized twice. ``truth`` carries the
    same two columns; ``total_records`` is the record count the
    comparison space n(n-1)/2 is computed from."""
    if not pairs_by_scheme:
        raise ValueError("pairs_by_scheme is empty")
    if total_records < 2:
        raise ValueError(f"total_records must be >= 2: {total_records}")
    space = total_records * (total_records - 1) / 2.0
    truth_pairs = truth.select("id_l", "id_r").distinct()
    n_truth = truth_pairs.agg(
        F.count("*").cast("long").alias("__n_truth")
    )

    rows = []
    for name, pairs in pairs_by_scheme.items():
        p = pairs.select("id_l", "id_r").distinct()
        counted = p.agg(F.count("*").cast("long").alias("n_pairs"))
        covered = truth_pairs.join(p, ["id_l", "id_r"], "leftsemi").agg(
            F.count("*").cast("long").alias("__n_cov")
        )
        rows.append(
            counted.crossJoin(covered)
            .crossJoin(n_truth)
            .select(
                F.lit(name).alias("scheme"),
                "n_pairs",
                F.round(1.0 - F.col("n_pairs") / space, 6).alias(
                    "reduction_ratio"
                ),
                F.round(
                    F.when(
                        F.col("__n_truth") > 0,
                        F.col("__n_cov") / F.col("__n_truth").cast("double"),
                    ).otherwise(F.lit(0.0)),
                    6,
                ).alias("pairs_completeness"),
            )
        )
    return reduce(DataFrame.unionAll, rows)
