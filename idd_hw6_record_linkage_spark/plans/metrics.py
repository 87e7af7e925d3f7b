"""Metrics / lineage table + resumability (FIXTURES.md §4).

Every pipeline stage appends per-partition lineage rows and one
completion row (partition_id = -1) to a parquet ``metrics`` table under
the run workdir. Resume = a stage whose completion row exists for the
run_id is skipped and its parquet output is read back instead of
recomputed (the reference's analogue is its CSV stage-file chain,
SURVEY §1.2; here the stage boundary doubles as checkpoint).
"""

from __future__ import annotations

import datetime as _dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.schema import METRICS_SCHEMA


def _metrics_path(workdir: str) -> str:
    return os.path.join(workdir, "metrics")


def per_partition_counts(df: DataFrame) -> list[tuple[int, int]]:
    """(partition_id, row_count) lineage for a stage output."""
    rows = (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .count()
        .collect()
    )
    return [(int(r["__pid"]), int(r["count"])) for r in rows]


def append_stage_metrics(
    spark: SparkSession,
    workdir: str,
    run_id: str,
    stage: str,
    df_out: DataFrame | None,
    rows_in: int | None = None,
    pair_count: int | None = None,
    match_count: int | None = None,
) -> None:
    now = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
    records = []
    rows_out_total = None
    if df_out is not None:
        parts = per_partition_counts(df_out)
        rows_out_total = sum(n for _, n in parts)
        for pid, n in parts:
            records.append((run_id, stage, pid, None, n, None, None, None, now))
    match_rate = (
        match_count / pair_count if (pair_count and match_count is not None) else None
    )
    records.append(
        (
            run_id,
            stage,
            -1,
            rows_in,
            rows_out_total,
            pair_count,
            match_count,
            match_rate,
            now,
        )
    )
    spark.createDataFrame(records, METRICS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(_metrics_path(workdir))


def stage_completed(spark: SparkSession, workdir: str, run_id: str, stage: str) -> bool:
    path = _metrics_path(workdir)
    if not os.path.exists(path):
        return False
    try:
        m = spark.read.parquet(path)
    except Exception:
        return False
    return (
        m.where(
            (F.col("run_id") == run_id)
            & (F.col("stage") == stage)
            & (F.col("partition_id") == -1)
        )
        .limit(1)
        .count()
        > 0
    )


def read_metrics(spark: SparkSession, workdir: str) -> DataFrame:
    return spark.read.parquet(_metrics_path(workdir))
