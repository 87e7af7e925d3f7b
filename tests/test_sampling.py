"""Deterministic corpus sampling / shard packing (operators.sampling):
fate stability, nesting, rate validation, and the two-pass prefix-sum
decomposition vs a naive global running sum."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.operators import sampling


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 4).cast("string")).alias(
            "source"
        ),
        (F.col("id") % 37 + 5).cast("long").alias("n_tok"),
    )


def test_sample_rates_roughly_hold_and_are_deterministic(spark):
    df = _docs(spark)
    rates = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
    out = sampling.sample_corpus(df, "doc_id", rates, default_rate=0.1)
    got = out.groupBy("source").count().collect()
    by_src = {r["source"]: r["count"] for r in got}
    assert by_src["src0"] == 100  # rate 1.0 keeps everything
    assert "src2" not in by_src  # rate 0.0 keeps nothing
    assert 25 <= by_src.get("src1", 0) <= 75  # ~50 of 100
    assert 2 <= by_src.get("src3", 0) <= 25  # default 0.1 of 100
    # determinism under repartitioning: identical surviving id set
    again = sampling.sample_corpus(
        df.repartition(13), "doc_id", rates, default_rate=0.1
    )
    assert {r["doc_id"] for r in out.select("doc_id").collect()} == {
        r["doc_id"] for r in again.select("doc_id").collect()
    }


def test_sample_nesting_property(spark):
    """A rate-0.2 sample is a subset of the rate-0.5 sample on the
    same key+salt: fate is fixed per row, thresholds nest."""
    df = _docs(spark)
    wide = {
        r["doc_id"]
        for r in sampling.sample_corpus(
            df, "doc_id", {}, default_rate=0.5
        ).collect()
    }
    narrow = {
        r["doc_id"]
        for r in sampling.sample_corpus(
            df, "doc_id", {}, default_rate=0.2
        ).collect()
    }
    assert narrow <= wide
    assert len(narrow) < len(wide)


def test_sample_salt_decorrelates(spark):
    df = _docs(spark)
    a = {
        r["doc_id"]
        for r in sampling.sample_corpus(
            df, "doc_id", {}, default_rate=0.5, salt="holdout"
        ).collect()
    }
    b = {
        r["doc_id"]
        for r in sampling.sample_corpus(
            df, "doc_id", {}, default_rate=0.5, salt="mix"
        ).collect()
    }
    assert a != b  # different draws...
    assert 50 <= len(a) <= 350 and 50 <= len(b) <= 350  # ...same rate


def test_sample_rejects_bad_rate_and_drops_null_keys(spark):
    df = _docs(spark)
    with pytest.raises(ValueError, match="out of \\[0,1\\]"):
        sampling.sample_corpus(df, "doc_id", {"src0": 1.5})
    withnull = df.withColumn(
        "doc_id", F.when(F.col("doc_id") == 0, None).otherwise(F.col("doc_id"))
    )
    out = sampling.sample_corpus(withnull, "doc_id", {}, default_rate=1.0)
    assert out.where(F.col("doc_id").isNull()).count() == 0
    assert out.count() == 399


def test_pack_shards_matches_naive_global_window(spark):
    from pyspark.sql import Window

    df = _docs(spark)
    got = sampling.pack_shards(df, "doc_id", "n_tok", 300)
    naive = (
        df.withColumn("__fate", sampling.hash_fate(F.col("doc_id")))
        .withColumn(
            "__before",
            F.sum("n_tok").over(Window.orderBy("__fate", "doc_id"))
            - F.col("n_tok"),
        )
        .select(
            "doc_id",
            F.floor(F.col("__before") / 300).cast("long").alias("shard_id"),
        )
    )
    g = {(r["doc_id"], r["shard_id"]) for r in got.collect()}
    n = {(r["doc_id"], r["shard_id"]) for r in naive.collect()}
    assert g == n


def test_pack_shards_budget_overshoot_bounded(spark):
    df = _docs(spark)
    out = sampling.pack_shards(df, "doc_id", "n_tok", 300)
    per = (
        out.groupBy("shard_id")
        .agg(F.sum("n_tok").alias("tok"), F.count("*").alias("n"))
        .collect()
    )
    max_doc = 41  # n_tok = id % 37 + 5 <= 41
    shards = {r["shard_id"]: r["tok"] for r in per}
    last = max(shards)
    for sid, tok in shards.items():
        assert tok < 300 + max_doc
        if sid != last:
            assert tok >= 300 - max_doc + 1  # full up to one doc short
    # shard_pos is the in-shard token offset: first doc of a shard
    # starts below one-doc overshoot
    firsts = (
        out.groupBy("shard_id").agg(F.min("shard_pos").alias("p")).collect()
    )
    assert all(r["p"] < max_doc for r in firsts)


def test_pack_shards_rejects_nonpositive_budget(spark):
    with pytest.raises(ValueError, match="positive"):
        sampling.pack_shards(_docs(spark), "doc_id", "n_tok", 0)
