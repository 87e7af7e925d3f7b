"""Structured-Streaming ingest of the pages table.

The reference is batch-only (SURVEY §2.9: no streams anywhere), so
this is an *extension*: the same normalize + blocking-key stages run
incrementally over a file-source stream, with watermarked streaming
exact-dedup on url. Pattern: readStream → stateless normalize →
(stateful) dropDuplicatesWithinWatermark → writeStream; the batch and
streaming plans share the exact same expression code
(plans.pipeline.normalize_plan), which is the point — one logical
plan, two execution modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.operators import blocking
from idd_hw6_record_linkage_spark.plans.pipeline import (
    PipelineConfig,
    block_keys_plan,
    normalize_plan,
)
from idd_hw6_record_linkage_spark.schema import PAGES_SCHEMA


def read_pages_stream(spark: SparkSession, path: str,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    reader = (
        spark.readStream.schema(PAGES_SCHEMA).format("parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def normalized_stream(pages_stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Incremental normalize + streaming exact-dedup on url: late
    re-crawls of the same url within the watermark are dropped."""
    out = normalize_plan(pages_stream)
    return out.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
        ["url"]
    )


def block_keys_stream(pages_stream: DataFrame,
                      cfg: PipelineConfig | None = None) -> DataFrame:
    """Streaming blocking-key emission — feed
    :func:`incremental_candidates` for the stream-batch join against
    the historical key index."""
    cfg = cfg or PipelineConfig(workdir="/tmp/_unused_stream")
    records = normalize_plan(pages_stream)
    return block_keys_plan(records, cfg)


def build_key_index(records: DataFrame,
                    cfg: PipelineConfig | None = None,
                    ) -> tuple[DataFrame, DataFrame]:
    """Historical key index for incremental linkage: the batch corpus's
    blocking keys with oversized blocks salted (content basis).

    Returns ``(keys, oversized)``. BOTH must be reused by the stream
    side: salting the sides from different oversized-block lists (or
    not salting the stream side at all) silently drops candidates for
    exactly the hot keys the cap targets — the same invariant
    blocking.cap_blocks_pair enforces for two-source batch linkage.
    Materialize both once (parquet/persist); they are static per index
    build."""
    cfg = cfg or PipelineConfig(workdir="/tmp/_unused_stream")
    raw = block_keys_plan(records, cfg)
    sizes = raw.groupBy("block_key").agg(F.count("*").alias("n"))
    big = blocking._oversized(sizes, cfg.max_block_size)
    keys = blocking._apply_salt(raw, big, F.xxhash64("salt_basis"))
    return keys, big


def incremental_candidates(pages_stream: DataFrame,
                           index_keys: DataFrame,
                           oversized: DataFrame,
                           cfg: PipelineConfig | None = None) -> DataFrame:
    """Stream-batch join (the seam the batch-only reference lacks):
    each micro-batch's pages are normalized, keyed, salted with the
    SAME oversized-block list as the historical index, and equi-joined
    against the static index — emitting exactly the new-vs-historical
    candidate pairs ``(id_new, id_old)`` for downstream scoring.

    The cross-batch ``dropDuplicates`` keeps one row per pair across
    triggers (state grows with emitted pairs; compact the index and
    restart the query on re-index, which also resets state)."""
    cfg = cfg or PipelineConfig(workdir="/tmp/_unused_stream")
    skeys = block_keys_plan(normalize_plan(pages_stream), cfg)
    skeys = blocking._apply_salt(skeys, oversized, F.xxhash64("salt_basis"))
    s = skeys.select(F.col("id").alias("id_new"), "block_key")
    h = index_keys.select(F.col("id").alias("id_old"), "block_key")
    return (
        s.join(h, "block_key")
        .where(F.col("id_new") != F.col("id_old"))
        .select("id_new", "id_old")
        .dropDuplicates(["id_new", "id_old"])
    )


def run_to_parquet(stream_df: DataFrame, out_path: str, checkpoint: str,
                   available_now: bool = True):
    """Materialize a streaming stage to parquet; availableNow drains
    everything currently in the source then stops (test/backfill mode)."""
    writer = (
        stream_df.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
