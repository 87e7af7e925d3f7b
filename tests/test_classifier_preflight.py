"""LR classifier arm (M1/M2, record_linkage.py:461-505), split + overlap
guard (O6/O7), and preflight contract checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.operators import scoring
from idd_hw6_record_linkage_spark.operators.evaluation import precision_recall_f1
from idd_hw6_record_linkage_spark.plans import preflight as P
from idd_hw6_record_linkage_spark.plans.pipeline import PipelineConfig, normalize_plan
from idd_hw6_record_linkage_spark.sources import generator as G


@pytest.fixture(scope="module")
def linkage_data(spark):
    raw = G.generate_raw(spark, 150, partitions=4).cache()
    pages = raw.select("url", "warc_ts", "html", "text", "lang")
    records = normalize_plan(pages).cache()
    truth = G.labeled_pairs(raw, negatives_per_positive=1.0).cache()
    truth.count()
    return records, truth


def test_lr_train_predict(spark, linkage_data):
    records, truth = linkage_data
    cfg = PipelineConfig(workdir="/tmp/_unused_lr")
    pairs = truth.select(
        F.least("url_l", "url_r").alias("id_l"),
        F.greatest("url_l", "url_r").alias("id_r"),
        "label",
    )
    feats = scoring.compute_features(
        pairs.select("id_l", "id_r"), records, cfg.comparator_config, "url"
    )
    labels = pairs.select("id_l", "id_r", "label")
    assembler, model = scoring.fit_logistic_regression(
        feats, labels, cfg.comparator_config
    )
    preds = scoring.predict_probability(feats, assembler, model)
    edges = preds.where(F.col("score") >= 0.5).select("id_l", "id_r")
    truth_pos = pairs.where(F.col("label") == 1).select("id_l", "id_r")
    prf = precision_recall_f1(edges, truth_pos)
    assert prf.f1 >= 0.99, (prf.precision, prf.recall, prf.f1)


def test_lr_labels_reversed_order_canonicalized(spark, linkage_data):
    """Label files may order each pair (r, l); training must
    canonicalize before joining to candidate features or those rows
    silently vanish from the training set."""
    records, truth = linkage_data
    cfg = PipelineConfig(workdir="/tmp/_unused_lr")
    pairs = truth.select(
        F.least("url_l", "url_r").alias("id_l"),
        F.greatest("url_l", "url_r").alias("id_r"),
        "label",
    )
    feats = scoring.compute_features(
        pairs.select("id_l", "id_r"), records, cfg.comparator_config, "url"
    )
    # every label arrives REVERSED relative to the canonical pairs
    reversed_labels = pairs.select(
        F.col("id_r").alias("id_l"), F.col("id_l").alias("id_r"), "label"
    )
    assembler, model = scoring.fit_logistic_regression(
        feats, reversed_labels, cfg.comparator_config
    )
    preds = scoring.predict_probability(feats, assembler, model)
    edges = preds.where(F.col("score") >= 0.5).select("id_l", "id_r")
    truth_pos = pairs.where(F.col("label") == 1).select("id_l", "id_r")
    prf = precision_recall_f1(edges, truth_pos)
    assert prf.f1 >= 0.99, (prf.precision, prf.recall, prf.f1)


def test_lr_empty_training_join_raises(spark, linkage_data):
    records, truth = linkage_data
    cfg = PipelineConfig(workdir="/tmp/_unused_lr")
    pairs = truth.select(
        F.least("url_l", "url_r").alias("id_l"),
        F.greatest("url_l", "url_r").alias("id_r"),
        "label",
    )
    feats = scoring.compute_features(
        pairs.select("id_l", "id_r"), records, cfg.comparator_config, "url"
    )
    stranger_labels = spark.createDataFrame(
        [("nope-l", "nope-r", 1)], "id_l string, id_r string, label int"
    )
    with pytest.raises(ValueError, match="no labeled pairs matched"):
        scoring.fit_logistic_regression(
            feats, stranger_labels, cfg.comparator_config
        )


def test_validate_scorer_fails_before_persist(spark):
    """Scorer misconfiguration must fail BEFORE run_in_memory persists
    any stage (a post-persist raise leaks CacheManager entries)."""
    from idd_hw6_record_linkage_spark.plans.pipeline import run_in_memory
    from idd_hw6_record_linkage_spark.sources.generator import generate_raw

    storage = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    before = len(storage)
    pages = generate_raw(spark, 10, partitions=1).select(
        "url", "warc_ts", "html", "text", "lang"
    )
    with pytest.raises(ValueError, match="unknown scorer"):
        run_in_memory(
            spark, pages, PipelineConfig(workdir="/tmp/_x", scorer="nope")
        )
    with pytest.raises(ValueError, match="requires labeled_pairs"):
        run_in_memory(
            spark, pages, PipelineConfig(workdir="/tmp/_x", scorer="lr")
        )
    after = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    assert after == before, "error path must not leave persisted stages"


def test_split_and_preflight(spark, linkage_data):
    _, truth = linkage_data
    pairs = truth.select(
        F.col("url_l").alias("source_id_l"),
        F.col("url_r").alias("source_id_r"),
        "label",
    )
    train, val, test = P.split_70_15_15(pairs, seed=42)
    n = pairs.count()
    nt, nv, ns = train.count(), val.count(), test.count()
    assert nt + nv + ns == n
    assert nt > nv and nt > ns
    infos = P.run_preflight(
        train, val, test,
        required_cols=["source_id_l", "source_id_r", "label"],
        id_cols=["source_id_l"],
        null_check_cols=["source_id_l", "source_id_r"],
        pair_key_cols=["source_id_l", "source_id_r"],
    )
    assert isinstance(infos, list)


def test_preflight_detects_overlap(spark):
    a = spark.createDataFrame([("x", "y", 1)], "source_id_l string, source_id_r string, label int")
    with pytest.raises(P.PreflightError, match="overlap"):
        P.check_pair_overlap(a, {"test": a}, ["source_id_l", "source_id_r"])


def test_preflight_detects_missing_column(spark):
    a = spark.createDataFrame([("x",)], "a string")
    with pytest.raises(P.PreflightError, match="missing"):
        P.check_required_columns(a, ["a", "b"], "train")
