"""Compression-ratio quality signal (functions.compress_signal)."""

from __future__ import annotations

import zlib

from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.functions import compress_signal


def test_compression_ratio_orders_junk_below_prose(spark):
    prose = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "quiet farmers watch distant clouds gather above the valley"
    )
    junk = "buy now " * 16
    df = spark.createDataFrame(
        [(1, prose), (2, junk), (3, None), (4, "")],
        "id long, text string",
    )
    got = {
        r["id"]: r["cr"]
        for r in df.select(
            "id", compress_signal.compression_ratio("text").alias("cr")
        ).collect()
    }
    assert got[3] is None
    assert got[4] == 1.0
    assert got[2] < got[1]  # repetitive junk compresses far better
    # exact parity with local zlib (the UDF is a plain deflate)
    exp = round(
        len(zlib.compress(prose.encode(), 6)) / len(prose.encode()), 6
    )
    assert got[1] == exp


def test_compression_ratio_is_arrow_batched(spark):
    df = spark.createDataFrame([("abc",)], "text string").select(
        compress_signal.compression_ratio("text")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
