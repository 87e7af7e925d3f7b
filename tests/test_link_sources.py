"""Two-source linkage (reference main case) and content-derived cap
salting recall."""

from __future__ import annotations

from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.operators import blocking
from idd_hw6_record_linkage_spark.operators.evaluation import precision_recall_f1
from idd_hw6_record_linkage_spark.plans.pipeline import PipelineConfig, link_sources
from idd_hw6_record_linkage_spark.sources import generator as G


def test_link_two_sources_f1(spark):
    raw = G.generate_raw(spark, 200, partitions=4).cache()
    # split cluster members into two "sources": member 0 vs the rest
    pages_l = raw.where(F.col("member") == 0).select(
        "url", "warc_ts", "html", "text", "lang"
    )
    pages_r = raw.where(F.col("member") > 0).select(
        "url", "warc_ts", "html", "text", "lang"
    )
    res = link_sources(spark, pages_l, pages_r)
    assert res["threshold_used"] == 0.5
    matches = res["matches"].select("id_l", "id_r")

    left = raw.where(F.col("member") == 0).select(
        F.col("url").alias("id_l"), F.col("entity_id").alias("e_l")
    )
    right = raw.where(F.col("member") > 0).select(
        F.col("url").alias("id_r"), F.col("entity_id").alias("e_r")
    )
    truth = left.join(right, F.col("e_l") == F.col("e_r")).select("id_l", "id_r")
    prf = precision_recall_f1(matches, truth)
    assert prf.f1 >= 0.99, (prf.precision, prf.recall, prf.f1)


def test_threshold_fallback_triggers(spark):
    from idd_hw6_record_linkage_spark.operators.scoring import (
        threshold_with_fallback,
    )

    scored = spark.createDataFrame(
        [("a", "b", 0.42), ("c", "d", 0.1)], "id_l string, id_r string, score double"
    )
    edges, used = threshold_with_fallback(scored, 0.5, 0.3)
    assert used == 0.3  # nothing >= 0.5 → reference fallback path
    assert edges.count() == 1


def test_cap_blocks_content_salt_keeps_duplicates_together(spark):
    # one hot key with 100 records in 10 duplicate groups of 10;
    # group members share the content basis
    rows = [
        (f"id{g:02d}_{m}", "hotkey", f"content-{g:02d}")
        for g in range(10)
        for m in range(10)
    ]
    keys = spark.createDataFrame(
        rows, "id string, block_key string, salt_basis string"
    ).withColumn("pass", F.lit("b1"))
    capped = blocking.cap_blocks(keys, max_block_size=20, salt_col="salt_basis")
    # every duplicate group must land in exactly one sub-block
    per_group = (
        capped.withColumn("grp", F.substring("salt_basis", 9, 2))
        .groupBy("grp")
        .agg(F.countDistinct("block_key").alias("nb"))
    )
    assert all(r["nb"] == 1 for r in per_group.collect())
    # and the hot key must actually be split
    assert capped.select("block_key").distinct().count() > 1


def test_pages_source_adapter(spark, tmp_path):
    from idd_hw6_record_linkage_spark.sources.pages import (
        iceberg_available,
        read_pages,
    )
    import pytest as _pt

    raw = G.generate_raw(spark, 10, partitions=2)
    p = str(tmp_path / "pages")
    raw.select("url", "warc_ts", "html", "text", "lang").write.parquet(p)
    got = read_pages(spark, p)
    assert got.count() > 0
    assert [f.name for f in got.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang",
    ]
    if not iceberg_available(spark):
        with _pt.raises(RuntimeError, match="iceberg"):
            read_pages(spark, "db.pages", format="iceberg")
