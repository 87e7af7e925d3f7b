"""Trainable document-quality classifier (operators.quality_model):
distributed featurize → fit → score → evaluate lifecycle on a
synthetic corpus whose good/junk separation is known."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.operators import quality_model, sampling

GOOD_WORDS = (
    "the data pipeline reads and writes many small files while the "
    "scheduler keeps track of all running tasks in order"
).split()


def _corpus(spark, n=300):
    """Docs 0..n-1: even ids are 'good' varied text with stopwords,
    odd ids are junk (one token repeated, zero stopwords)."""
    rows = []
    for i in range(n):
        if i % 2 == 0:
            words = [GOOD_WORDS[(i + j) % len(GOOD_WORDS)] for j in range(40)]
            rows.append((i, " ".join(words), 1))
        else:
            rows.append((i, " ".join([f"tok{i % 7}"] * 40), 0))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_quality_lr_lifecycle_separates_junk(spark):
    df = _corpus(spark)
    feat = quality_model.doc_features(df, "text")
    # deterministic fate split: ~70% train / 30% eval
    fate = sampling.hash_fate(F.col("doc_id"), salt="qsplit")
    train = feat.where(fate < 0.7)
    test = feat.where(fate >= 0.7)
    model = quality_model.train_quality_lr(train, "label")
    metrics = quality_model.evaluate_quality(model, test, "label")
    assert metrics["n"] > 50
    assert metrics["auc"] >= 0.95, metrics
    assert metrics["accuracy"] >= 0.9, metrics
    scored = quality_model.score_quality(model, test)
    assert "quality_prob" in scored.columns
    # probabilities separate the classes on average
    means = {
        r["label"]: r["p"]
        for r in scored.groupBy("label")
        .agg(F.avg("quality_prob").alias("p"))
        .collect()
    }
    assert means[1] > 0.8 > 0.2 > means[0]


def test_quality_features_drop_null_and_empty(spark):
    df = spark.createDataFrame(
        [(1, None, 0), (2, "   ", 0), (3, "real text here", 1)],
        "doc_id long, text string, label int",
    )
    feat = quality_model.doc_features(df, "text")
    assert [r["doc_id"] for r in feat.select("doc_id").collect()] == [3]


def test_quality_lr_rejects_single_class(spark):
    df = _corpus(spark, n=40).where(F.col("label") == 1)
    feat = quality_model.doc_features(df, "text")
    with pytest.raises(ValueError, match="both classes"):
        quality_model.train_quality_lr(feat, "label")
