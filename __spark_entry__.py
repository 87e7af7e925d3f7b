"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship dedupe/linkage plan end-to-end over
a pages table synthesized from the sf0.001 documents parquet;
``queries()``/``oracle_sql()`` expose one DuckDB-checkable slice per
implemented operator family (see SURVEY.md §2 and
idd_hw6_record_linkage_spark/entry_queries.py for the mapping).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF0001 = "/root/testdata/sf0.001"


def _pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver documents table to the input_hint pages shape
    (url, warc_ts, html, text, lang) — deterministic, no external data."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    title = F.concat_ws(" ", F.slice(F.split(F.trim("text"), r"\s+"), 1, 5))
    return docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        (F.to_timestamp(F.lit("2020-01-01 00:00:00"))
         + F.make_interval(secs=F.col("doc_id").cast("double"))).alias("warc_ts"),
        F.concat(
            F.lit("<html><title>"), title, F.lit("</title><body>"),
            F.col("text"), F.lit("</body></html>"),
        ).cast("binary").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: normalize → 3-pass blocking → score → threshold →
    connected components; returns the clusters DataFrame."""
    # Make the package importable in forked Python workers when the
    # driver did not set PYTHONPATH (pandas-UDF closures).
    os.environ.setdefault("PYTHONPATH", _REPO)
    from idd_hw6_record_linkage_spark.plans.pipeline import run_in_memory

    pages = _pages_from_documents(spark, SF0001)
    return run_in_memory(spark, pages)["clusters"]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from idd_hw6_record_linkage_spark.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from idd_hw6_record_linkage_spark.entry_queries import ORACLES

    return dict(ORACLES)
