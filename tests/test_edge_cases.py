"""Degenerate-input hardening: empty table, all-null fields,
duplicate urls. A 100-TB crawl WILL contain every one of these."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.plans.pipeline import run_in_memory
from idd_hw6_record_linkage_spark.schema import PAGES_SCHEMA


def _pages(spark, rows):
    return spark.createDataFrame(rows, PAGES_SCHEMA)


TS = datetime.datetime(2020, 1, 1)


def test_empty_pages_table(spark):
    res = run_in_memory(spark, _pages(spark, []))
    assert res["clusters"].count() == 0
    assert res["edges"].count() == 0


def test_all_null_text_html_lang(spark):
    rows = [
        (f"https://a.example.com/{i}", TS, None, None, None) for i in range(6)
    ]
    res = run_in_memory(spark, _pages(spark, rows))
    out = res["clusters"].collect()
    # every url survives as its own singleton cluster — null text must
    # not match null text (missing -> similarity 0, reference semantics)
    assert len(out) == 6
    assert len({r["entity_id"] for r in out}) == 6


def test_duplicate_urls_do_not_blow_up(spark):
    rows = [
        ("https://a.example.com/x", TS,
         bytearray(b"<html><title>t</title>page body</html>"),
         "same text body here", "en")
        for _ in range(4)
    ]
    res = run_in_memory(spark, _pages(spark, rows))
    # identical url duplicates collapse to one cluster assignment row
    # per distinct url after clustering
    assert res["clusters"].select("url").distinct().count() == 1


def test_empty_string_text_is_missing_not_equal(spark):
    rows = [
        ("https://a.example.com/1", TS, None, "", "en"),
        ("https://a.example.com/2", TS, None, "", "en"),
    ]
    res = run_in_memory(spark, _pages(spark, rows))
    # two empty texts share domain+lang blocks but must not edge-match:
    # empty -> NULL text_cmp -> comparators score 0
    assert res["edges"].count() == 0
