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
    """Streaming blocking-key emission — candidates for a downstream
    stream-batch join against the historical key index."""
    cfg = cfg or PipelineConfig(workdir="/tmp/_unused_stream")
    records = normalize_plan(pages_stream)
    return block_keys_plan(records, cfg)


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
