"""Pinned schemas — never inferred.

The reference loads CSVs with ``pd.read_csv(low_memory=False)`` and
coerces types ad hoc per field (``scripts/allineamento_dataset/
align_dataset.py:16-18``); here every table has an explicit StructType
so parquet scans prune columns and pushdown works deterministically.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Primary input: Common-Crawl-style web pages (BASELINE.json input_hint).
PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), nullable=False),
        StructField("warc_ts", TimestampType(), nullable=True),
        StructField("html", BinaryType(), nullable=True),
        StructField("text", StringType(), nullable=True),
        StructField("lang", StringType(), nullable=True),
    ]
)

# Ground truth: one row per labeled pair (reference convention: each GT
# row IS a positive pair, scripts/record_linkage/record_linkage.py:133-135).
LABELED_PAIRS_SCHEMA = StructType(
    [
        StructField("url_l", StringType(), nullable=False),
        StructField("url_r", StringType(), nullable=False),
        StructField("label", IntegerType(), nullable=False),
    ]
)

# Oracle clusters for the synthetic generator (entity_id = min url).
EXPECTED_CLUSTERS_SCHEMA = StructType(
    [
        StructField("url", StringType(), nullable=False),
        StructField("entity_id", StringType(), nullable=False),
    ]
)

# Per-stage / per-partition lineage + metrics rows (resumability).
METRICS_SCHEMA = StructType(
    [
        StructField("run_id", StringType(), nullable=False),
        StructField("stage", StringType(), nullable=False),
        StructField("partition_id", IntegerType(), nullable=True),
        StructField("rows_in", LongType(), nullable=True),
        StructField("rows_out", LongType(), nullable=True),
        StructField("pair_count", LongType(), nullable=True),
        StructField("match_count", LongType(), nullable=True),
        StructField("match_rate", DoubleType(), nullable=True),
        StructField("completed_at", TimestampType(), nullable=False),
    ]
)

# Stage names in pipeline order (FIXTURES.md §4).
STAGES = (
    "normalize",
    "block_b1",
    "block_b2",
    "block_lsh",
    "pairs",
    "score",
    "edges",
    "cluster",
    "eval",
)
