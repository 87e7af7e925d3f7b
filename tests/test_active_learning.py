"""Uncertainty-sampling active learning (operators.active_learning):
the engine-native M4 loop — select least-certain pairs, query the
oracle for just those, refit, repeat."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.operators import active_learning as AL
from idd_hw6_record_linkage_spark.operators.scoring import (
    Comparator,
    ComparatorConfig,
    predict_probability,
)

CFG = ComparatorConfig(
    "al_test",
    (
        Comparator("f1", "exact", "a"),
        Comparator("f2", "exact", "b"),
        Comparator("f3", "exact", "c"),
    ),
)


def _pool(spark, n=400):
    """Deterministic pool: three features in [0,1]; true label is a
    margin-separated linear rule (no noise at the boundary, so a
    correctly-run loop converges to ~perfect accuracy)."""
    df = (
        spark.range(n)
        .select(
            F.concat(F.lit("L"), F.col("id")).alias("id_l"),
            F.concat(F.lit("R"), F.col("id")).alias("id_r"),
            (F.pmod(F.xxhash64("id", F.lit(1)), 1000) / 1000.0).alias("f1"),
            (F.pmod(F.xxhash64("id", F.lit(2)), 1000) / 1000.0).alias("f2"),
            (F.pmod(F.xxhash64("id", F.lit(3)), 1000) / 1000.0).alias("f3"),
        )
        .withColumn("__s", (F.col("f1") + F.col("f2") + F.col("f3")) / 3.0)
        # carve out a margin band so the two classes are separable
        .where(F.abs(F.col("__s") - 0.5) > 0.05)
        .withColumn("label", (F.col("__s") > 0.5).cast("int"))
        .drop("__s")
    )
    return df.cache()


def _truth_oracle(truth):
    def oracle(pairs):
        return pairs.join(truth.select("id_l", "id_r", "label"),
                          ["id_l", "id_r"])
    return oracle


def test_uncertainty_sample_picks_nearest_half(spark):
    scored = spark.createDataFrame(
        [("a", "b", 0.91), ("c", "d", 0.52), ("e", "f", 0.10),
         ("g", "h", 0.47), ("i", "j", 0.99)],
        "id_l string, id_r string, score double",
    )
    got = {
        (r["id_l"], r["id_r"])
        for r in AL.uncertainty_sample(scored, 2).collect()
    }
    assert got == {("c", "d"), ("g", "h")}


def test_active_learn_reaches_high_accuracy_with_tiny_budget(spark):
    pool = _pool(spark)
    n_pool = pool.count()
    feats = pool.select("id_l", "id_r", "f1", "f2", "f3")
    # bootstrap: 3 deterministic examples of each class
    seed = (
        pool.withColumn("__h", F.xxhash64("id_l"))
        .withColumn(
            "__rk",
            F.row_number().over(
                __import__("pyspark").sql.Window.partitionBy("label")
                .orderBy("__h")
            ),
        )
        .where(F.col("__rk") <= 3)
        .select("id_l", "id_r", "label")
    )
    assembler, model, labeled, history = AL.active_learn_lr(
        feats, _truth_oracle(pool), CFG, seed, rounds=3, batch_size=15
    )
    n_labels = labeled.count()
    assert n_labels <= 6 + 3 * 15  # budget respected
    assert n_labels < n_pool / 4  # a small fraction of the pool
    assert len(history) == 3 and history[0]["n_labeled"] == 6
    scored = predict_probability(feats, assembler, model)
    acc = (
        scored.join(pool.select("id_l", "id_r", "label"), ["id_l", "id_r"])
        .select(
            F.avg(
                ((F.col("score") > 0.5).cast("int") == F.col("label"))
                .cast("double")
            ).alias("acc")
        )
        .collect()[0]["acc"]
    )
    assert acc >= 0.95, f"AL accuracy {acc:.3f} with {n_labels} labels"


def test_active_learn_requires_both_classes_in_seed(spark):
    pool = _pool(spark, 100)
    feats = pool.select("id_l", "id_r", "f1", "f2", "f3")
    seed = pool.where("label = 1").limit(3).select("id_l", "id_r", "label")
    with pytest.raises(ValueError, match="both classes"):
        AL.active_learn_lr(feats, _truth_oracle(pool), CFG, seed)


def test_active_learn_stops_when_oracle_exhausted(spark):
    """An oracle that can label nothing new ends the loop early."""
    pool = _pool(spark, 100)
    feats = pool.select("id_l", "id_r", "f1", "f2", "f3")
    seed = (
        pool.withColumn("__h", F.xxhash64("id_l"))
        .withColumn(
            "__rk",
            F.row_number().over(
                __import__("pyspark").sql.Window.partitionBy("label")
                .orderBy("__h")
            ),
        )
        .where(F.col("__rk") <= 2)
        .select("id_l", "id_r", "label")
    )

    def mute_oracle(pairs):
        return pairs.join(
            pool.select("id_l", "id_r", "label"), ["id_l", "id_r"]
        ).where(F.lit(False))

    _, _, labeled, history = AL.active_learn_lr(
        feats, mute_oracle, CFG, seed, rounds=5, batch_size=10
    )
    assert labeled.count() == 4  # nothing beyond the seed
    assert len(history) == 1  # stopped after the first empty round
