"""Golden-pair end-to-end test (SURVEY §5): synthetic pages with
planted clusters → full pipeline → pairwise cluster F1 ≥ 0.99, plus
blocking PC/RR sanity, resumability, and generator determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.operators import blocking
from idd_hw6_record_linkage_spark.plans.pipeline import LinkagePipeline, PipelineConfig
from idd_hw6_record_linkage_spark.plans import metrics as M
from idd_hw6_record_linkage_spark.sources import generator as G

N_ENTITIES = 300


@pytest.fixture(scope="module")
def raw(spark):
    df = G.generate_raw(spark, N_ENTITIES, partitions=8).cache()
    df.count()
    return df


def test_generator_deterministic_across_partitioning(spark):
    a = G.generate_raw(spark, 50, partitions=2)
    b = G.generate_raw(spark, 50, partitions=7)
    ah = a.agg(F.expr("bit_xor(xxhash64(url, text, lang))")).collect()[0][0]
    bh = b.agg(F.expr("bit_xor(xxhash64(url, text, lang))")).collect()[0][0]
    assert a.count() == b.count()
    assert ah == bh


def test_pipeline_f1(tmp_path, spark, raw):
    pages = raw.select("url", "warc_ts", "html", "text", "lang")
    truth = G.labeled_pairs(raw).cache()
    expected = G.expected_clusters(raw)

    cfg = PipelineConfig(workdir=str(tmp_path / "run"), run_id="t1")
    pipe = LinkagePipeline(spark, cfg)
    res = pipe.run(pages, labeled_pairs=truth, expected_clusters=expected)

    # blocking must retain essentially all true pairs
    assert res["pairs_completeness"] >= 0.99, res["pairs_completeness"]
    # headline: pairwise cluster F1 vs planted clusters
    prf = res["cluster_prf1"]
    assert prf.f1 >= 0.99, (prf.precision, prf.recall, prf.f1)
    # edge-level F1 vs labeled pairs (positives only)
    eprf = res["edge_prf1"]
    assert eprf.recall >= 0.99 and eprf.precision >= 0.95, eprf

    # metrics table has completion rows for every materialized stage
    m = M.read_metrics(spark, cfg.workdir)
    stages = {
        r["stage"] for r in m.where(F.col("partition_id") == -1).collect()
    }
    assert {"normalize", "pairs", "score", "edges", "cluster"} <= stages


def test_blocking_stats_and_rr(spark, raw):
    records = raw.select(
        "url", F.col("domain").alias("domain")
    )
    keys = blocking.key_table(records, "url", F.col("domain"), "b1")
    stats = blocking.block_size_stats(keys).collect()[0]
    assert stats["n_blocks"] > 0
    assert stats["records_in_blocks"] == records.count()
    rr = blocking.reduction_ratio(keys, records.count())
    assert 0.0 < rr < 1.0


def test_resume_skips_completed_stages(tmp_path, spark, raw):
    pages = raw.select("url", "warc_ts", "html", "text", "lang").limit(200)
    cfg = PipelineConfig(workdir=str(tmp_path / "resume"), run_id="r1",
                         use_lsh=False)
    pipe = LinkagePipeline(spark, cfg)
    pipe.run(pages)
    m1 = M.read_metrics(spark, cfg.workdir)
    n_rows_1 = m1.count()

    cfg2 = PipelineConfig(workdir=str(tmp_path / "resume"), run_id="r1",
                          use_lsh=False, resume=True)
    pipe2 = LinkagePipeline(spark, cfg2)
    res2 = pipe2.run(pages)
    m2 = M.read_metrics(spark, cfg2.workdir)
    # resumed run adds no new metric rows (all stages skipped)
    assert m2.count() == n_rows_1
    assert res2["clusters"].count() == 200


def test_pipeline_lr_scorer_f1(tmp_path, spark, raw):
    """M1/M2 wired into the flagship lifecycle (the reference trains
    LR per run, record_linkage.py:461-505): scorer='lr' + labeled
    pairs must clear the same cluster-F1 bar through the unchanged
    threshold-with-fallback path."""
    pages = raw.select("url", "warc_ts", "html", "text", "lang")
    truth = G.labeled_pairs(raw).cache()
    expected = G.expected_clusters(raw)

    cfg = PipelineConfig(workdir=str(tmp_path / "lr"), run_id="lr1",
                         scorer="lr")
    res = LinkagePipeline(spark, cfg).run(
        pages, labeled_pairs=truth, expected_clusters=expected
    )
    prf = res["cluster_prf1"]
    assert prf.f1 >= 0.99, (prf.precision, prf.recall, prf.f1)
    # LR scores are probabilities
    mm = res["scored"].agg(F.min("score"), F.max("score")).collect()[0]
    assert mm[0] >= 0.0 and mm[1] <= 1.0


def test_lr_scorer_requires_labels(spark, raw):
    from idd_hw6_record_linkage_spark.plans.pipeline import run_in_memory

    pages = raw.select("url", "warc_ts", "html", "text", "lang").limit(50)
    cfg = PipelineConfig(workdir="/tmp/_unused", scorer="lr")
    with pytest.raises(ValueError, match="labeled_pairs"):
        run_in_memory(spark, pages, cfg)["scored"].count()


def test_run_in_memory_release_unpersists(spark):
    """run_in_memory's caches are intentionally session-scoped; the
    returned release() handle must drop every CacheManager entry so
    long-lived sessions running many pipelines don't accumulate."""
    from idd_hw6_record_linkage_spark.plans.pipeline import run_in_memory

    spark.catalog.clearCache()
    pages = G.generate_pages(spark, 80)
    res = run_in_memory(spark, pages)
    res["clusters"].count()
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert not cm.isEmpty()
    res["release"]()
    assert cm.isEmpty()


def test_pipeline_collapse_recrawls_flag(spark):
    """cfg.collapse_recrawls=True: tracking-param re-crawl variants of
    every page (older warc_ts) collapse to the original before
    blocking — record count and clusters match the no-variant run."""
    from idd_hw6_record_linkage_spark.sources.generator import (
        expected_clusters,
        generate_raw,
    )
    from idd_hw6_record_linkage_spark.plans.pipeline import (
        PipelineConfig,
        run_in_memory,
    )
    from idd_hw6_record_linkage_spark.operators.evaluation import (
        pairwise_cluster_f1,
    )

    raw = generate_raw(spark, 120).cache()
    pages = raw.select("url", "warc_ts", "html", "text", "lang")
    n_pages = pages.count()
    dup = pages.select(
        F.concat(F.col("url"), F.lit("?utm_source=dup&fbclid=x")).alias("url"),
        F.expr("warc_ts - INTERVAL 1 HOUR").alias("warc_ts"),
        "html", "text", "lang",
    )
    noisy = pages.unionByName(dup)
    cfg = PipelineConfig(workdir="/tmp/_unused", run_id="collapse",
                         collapse_recrawls=True)
    res = run_in_memory(spark, noisy, cfg)
    try:
        assert res["records"].count() == n_pages
        # survivors are the LATEST crawls = the original raw urls
        assert res["records"].where(
            F.col("url").contains("utm_source")).count() == 0
        prf = pairwise_cluster_f1(res["clusters"], expected_clusters(raw))
        assert prf.f1 == 1.0, prf
    finally:
        res["release"]()


def test_pipeline_strip_boilerplate_flag(spark):
    """cfg.strip_boilerplate_min_docs: a cookie banner glued onto
    every page's text is stripped before normalize, so the cleaned
    text equals the banner-free run's and clustering stays perfect."""
    from idd_hw6_record_linkage_spark.sources.generator import (
        expected_clusters,
        generate_raw,
    )
    from idd_hw6_record_linkage_spark.plans.pipeline import (
        PipelineConfig,
        run_in_memory,
    )
    from idd_hw6_record_linkage_spark.operators.evaluation import (
        pairwise_cluster_f1,
    )

    raw = generate_raw(spark, 100).cache()
    pages = raw.select("url", "warc_ts", "html", "text", "lang")
    banner = "accept all cookies to continue"
    noisy = pages.withColumn(
        "text", F.concat(F.lit(banner + "\n"), F.col("text"))
    )
    cfg = PipelineConfig(workdir="/tmp/_unused", run_id="boiler",
                         strip_boilerplate_min_docs=50)
    res = run_in_memory(spark, noisy, cfg)
    try:
        assert res["records"].where(
            F.col("text_clean").contains(banner)).count() == 0
        prf = pairwise_cluster_f1(res["clusters"], expected_clusters(raw))
        assert prf.f1 == 1.0, prf
    finally:
        res["release"]()
