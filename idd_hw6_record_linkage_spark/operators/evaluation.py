"""Evaluation: P/R/F1 via semi/anti joins, cluster pairwise F1,
bootstrap CI, subgroup recall (SURVEY §2.5 A4/A5/A8/A9/A10).

The reference computes these with Python set algebra over pair tuples
(record_linkage.py:140-165); here predicted and true pair sets stay
distributed and TP/FP/FN are leftsemi/leftanti join counts.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PRF1:
    precision: float
    recall: float
    f1: float
    tp: int
    fp: int
    fn: int


def canonical_pairs(df: DataFrame, l: str = "id_l", r: str = "id_r") -> DataFrame:  # noqa: E741
    """Order-insensitive pair canonicalization (id_l < id_r)."""
    return df.select(
        F.least(l, r).alias("id_l"), F.greatest(l, r).alias("id_r")
    ).dropDuplicates(["id_l", "id_r"])


def precision_recall_f1(predicted: DataFrame, truth: DataFrame) -> PRF1:
    """A5 (record_linkage.py:140-165): TP = preds ⋉ truth,
    FP = preds ▷ truth, FN = truth ▷ preds."""
    preds = canonical_pairs(predicted)
    true = canonical_pairs(truth)
    tp = preds.join(true, ["id_l", "id_r"], "leftsemi").count()
    fp = preds.join(true, ["id_l", "id_r"], "leftanti").count()
    fn = true.join(preds, ["id_l", "id_r"], "leftanti").count()
    precision = tp / (tp + fp) if (tp + fp) > 0 else 0.0
    recall = tp / (tp + fn) if (tp + fn) > 0 else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if (precision + recall) > 0
        else 0.0
    )
    return PRF1(precision, recall, f1, tp, fp, fn)


def cluster_implied_pairs(clusters: DataFrame) -> DataFrame:
    """clusters(url, entity_id) → all within-cluster pairs (url_l <
    url_r). Self-join on entity_id; cluster sizes are bounded by the
    block cap upstream so the quadratic stays local."""
    left = clusters.select(F.col("entity_id"), F.col("url").alias("id_l"))
    right = clusters.select(F.col("entity_id"), F.col("url").alias("id_r"))
    return (
        left.join(right, "entity_id")
        .where(F.col("id_l") < F.col("id_r"))
        .select("id_l", "id_r")
    )


def pairwise_cluster_f1(predicted_clusters: DataFrame, expected_clusters: DataFrame) -> PRF1:
    """North-rule headline metric: F1 over the pair sets implied by
    predicted vs expected cluster assignments."""
    return precision_recall_f1(
        cluster_implied_pairs(predicted_clusters),
        cluster_implied_pairs(expected_clusters),
    )


def bootstrap_f1_ci(
    predicted: DataFrame,
    truth: DataFrame,
    n_resamples: int = 200,
    seed: int = 42,
) -> tuple[float, float]:
    """A8 (3_audit_models.py:131-183): bootstrap CI on F1 by Poisson
    resampling of the truth set — single pass per resample, no
    driver-side materialization of pairs."""
    import numpy as np

    preds = canonical_pairs(predicted).withColumn("hit", F.lit(1))
    true = canonical_pairs(truth)
    joined = true.join(preds, ["id_l", "id_r"], "left").select(
        F.coalesce("hit", F.lit(0)).alias("hit")
    )
    hits = np.array([r["hit"] for r in joined.collect()], dtype=np.int64)
    n_pred = preds.count()
    rng = np.random.RandomState(seed)
    f1s = []
    n = len(hits)
    for _ in range(n_resamples):
        sample = hits[rng.randint(0, n, size=n)]
        tp = int(sample.sum())
        fn = n - tp
        fp = n_pred - tp  # approximation: predictions fixed
        p = tp / (tp + fp) if tp + fp else 0.0
        r = tp / (tp + fn) if tp + fn else 0.0
        f1s.append(2 * p * r / (p + r) if p + r else 0.0)
    return float(np.percentile(f1s, 2.5)), float(np.percentile(f1s, 97.5))


def feature_means(feats: DataFrame, cols: list[str]) -> DataFrame:
    """A6 (record_linkage.py:465-467): per-comparator mean over the
    feature matrix — the reference prints this diagnostic every run.
    One partial-aggregatable pass; no collect."""
    return feats.agg(
        *[F.round(F.avg(c), 6).alias(f"avg_{c}") for c in cols]
    )


def impossible_match_rate(
    matches: DataFrame,
    attrs: DataFrame,
    id_col: str,
    attr_col: str,
    max_gap: float,
) -> DataFrame:
    """A10 (3_audit_models.py:206-249): share of predicted match pairs
    whose numeric attribute gap exceeds ``max_gap`` — pairs a domain
    rule says cannot be the same entity (the reference audits
    |year_l - year_r| > 1). Join + one aggregation; returns a single
    row (n_matches, n_impossible, impossible_rate)."""
    a_l = attrs.select(
        F.col(id_col).alias("id_l"), F.col(attr_col).alias("_attr_l")
    )
    a_r = attrs.select(
        F.col(id_col).alias("id_r"), F.col(attr_col).alias("_attr_r")
    )
    gap_exceeded = (
        F.abs(F.col("_attr_l") - F.col("_attr_r")) > F.lit(float(max_gap))
    ).cast("long")
    return (
        matches.join(a_l, "id_l")
        .join(a_r, "id_r")
        .agg(
            F.count("*").cast("long").alias("n_matches"),
            F.sum(gap_exceeded).cast("long").alias("n_impossible"),
            F.round(F.avg(gap_exceeded.cast("double")), 6).alias(
                "impossible_rate"
            ),
        )
    )


def subgroup_recall(
    predicted: DataFrame, truth: DataFrame, attrs: DataFrame,
    bucket_col: str, id_col: str = "url",
) -> DataFrame:
    """A9 (3_audit_models.py:186-204): recall per attribute bucket of
    the left record."""
    true = canonical_pairs(truth).join(
        attrs.select(F.col(id_col).alias("id_l"), F.col(bucket_col).alias("bucket")),
        "id_l",
    )
    preds = canonical_pairs(predicted).withColumn("hit", F.lit(1))
    joined = true.join(preds, ["id_l", "id_r"], "left")
    return joined.groupBy("bucket").agg(
        F.count("*").alias("n_true"),
        F.sum(F.coalesce("hit", F.lit(0))).alias("n_found"),
        (F.sum(F.coalesce("hit", F.lit(0))) / F.count("*")).alias("recall"),
    )
