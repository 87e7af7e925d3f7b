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


def _skewed(spark, n=600):
    # source share: s0 ~ 1/2, s1 ~ 1/3, s2 ~ 1/6 (id mod 6 buckets)
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 6 < 3, "s0")
        .when(F.col("id") % 6 < 5, "s1")
        .otherwise("s2")
        .alias("source"),
        (F.col("id") % 11 + 1).cast("long").alias("n_tok"),
    )


def test_temperature_rates_alpha_one_is_identity(spark):
    rates = {
        r.source: r.rate
        for r in sampling.temperature_rates(
            _skewed(spark), alpha=1.0
        ).collect()
    }
    assert all(abs(v - 1.0) < 1e-12 for v in rates.values()), rates


def test_temperature_rates_alpha_zero_is_uniform_lift(spark):
    # alpha=0: q uniform, lift 1/p -> rarest source keeps 1.0, others
    # keep p_rarest / p_s exactly.
    rows = sampling.temperature_rates(_skewed(spark), alpha=0.0).collect()
    w = {r.source: r.w for r in rows}
    p_min = min(w.values()) / sum(w.values())
    for r in rows:
        assert abs(r.rate - p_min / r.p) < 1e-12, r


def test_temperature_rates_flatten_monotonically(spark):
    # alpha=0.5 sits between natural and uniform: the dominant source
    # is down-sampled, the rarest keeps everything, and rates order
    # inversely to shares.
    rows = sorted(
        sampling.temperature_rates(_skewed(spark), alpha=0.5).collect(),
        key=lambda r: r.p,
    )
    rates = [r.rate for r in rows]
    assert rates[0] == pytest.approx(1.0, abs=1e-12)  # rarest
    assert all(a >= b - 1e-12 for a, b in zip(rates, rates[1:]))
    assert rows[-1].rate == pytest.approx(
        (rows[0].p / rows[-1].p) ** 0.5, rel=1e-9
    )


def test_sample_temperature_composes_fate_and_rates(spark):
    d = _skewed(spark)
    out = sampling.sample_temperature(d, "doc_id", alpha=0.5)
    rates = {
        r.source: r.rate
        for r in sampling.temperature_rates(d, alpha=0.5).collect()
    }
    # every surviving row's fate is under its source rate; every
    # dropped row's fate is over it (exact fate recomputation).
    fates = {
        r.doc_id: r.f
        for r in d.select(
            "doc_id", sampling.hash_fate(F.col("doc_id")).alias("f")
        ).collect()
    }
    kept = {r.doc_id for r in out.collect()}
    for r in d.collect():
        assert (fates[r.doc_id] < rates[r.source]) == (r.doc_id in kept)


def test_temperature_weight_col_changes_basis(spark):
    d = _skewed(spark)
    by_rows = {
        r.source: r.w
        for r in sampling.temperature_rates(d, alpha=0.5).collect()
    }
    by_tok = {
        r.source: r.w
        for r in sampling.temperature_rates(
            d, alpha=0.5, weight_col="n_tok"
        ).collect()
    }
    naive = {
        r.source: r.t
        for r in d.groupBy("source").agg(F.sum("n_tok").alias("t")).collect()
    }
    assert by_tok == naive and by_tok != by_rows


def test_temperature_rejects_negative_alpha(spark):
    with pytest.raises(ValueError, match="alpha"):
        sampling.temperature_rates(_skewed(spark), alpha=-0.1)
