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


def test_empty_pages_table_staged(spark, tmp_path):
    """The STAGED path (workdir metrics sink) on empty input: the
    block-stats metrics row used to crash on int(NULL) — sum() over an
    empty key table is NULL, which run_in_memory never exercises
    because only the staged pipeline persists stage metrics."""
    from idd_hw6_record_linkage_spark.plans.pipeline import dedupe_pages

    res = dedupe_pages(spark, _pages(spark, []), workdir=str(tmp_path / "wd"))
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


def test_bpe_token_count_and_stopword_ratio_edges(spark):
    """BPE-ish counter and stopword ratio on null/blank/unicode edges:
    NULL text counts 0 tokens and ratio 0.0 (missing, not an error);
    contractions split per the GPT-2-style pre-tokenizer."""
    from idd_hw6_record_linkage_spark.functions import text_analysis as TA

    rows = [
        (0, None),
        (1, ""),
        (2, "   "),
        (3, "don't"),            # don | 't  -> 2 BPE tokens
        (4, "the cat and the dog run"),  # 3/6 stopwords
        (5, "café 東京 42km"),
    ]
    df = spark.createDataFrame(rows, "i int, text string")
    got = {
        r.i: (r.n, r.ratio)
        for r in df.select(
            "i",
            TA.bpe_token_count_expr("text").alias("n"),
            F.round(TA.stopword_ratio_expr("text"), 6).alias("ratio"),
        ).collect()
    }
    assert got[0] == (0, 0.0)
    assert got[1] == (0, 0.0)
    assert got[3][0] == 2
    assert got[4][1] == 0.5
    assert got[5][0] >= 4  # café | <sp>東京 | <sp>42 | km


def test_bpe_pretoken_vt_parity_with_duckdb(spark):
    """Java's `\\s` includes U+000B (vertical tab), RE2's does not —
    the pattern therefore spells whitespace as the explicit class
    `[\\t-\\r ]` so Spark and DuckDB tokenize VT-bearing text
    identically (token-for-token, not just count)."""
    import duckdb

    from idd_hw6_record_linkage_spark.functions import text_analysis as TA

    texts = ["\x0b ", "a\x0bb", "x \x0b\ty", "don't\x0bstop", "a  b"]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "i int, text string")
    got = {
        r.i: r.toks
        for r in df.select(
            "i",
            F.regexp_extract_all(
                "text", F.lit(TA.BPE_PRETOKEN_RE), F.lit(0)
            ).alias("toks"),
        ).collect()
    }
    con = duckdb.connect()
    pat = TA.BPE_PRETOKEN_RE.replace("'", "''")
    for i, t in rows:
        exp = con.execute(
            f"SELECT regexp_extract_all(?, '{pat}')", [t]
        ).fetchone()[0]
        assert got[i] == exp, (i, t, got[i], exp)


def test_repetition_ratio_edges(spark):
    """Duplicate-trigram share: NULL/blank/short text scores 0.0 (not
    an error); a fully-repeated phrase scores its exact dup share;
    all-unique trigrams score 0.0. Values must be the exact doubles
    the DuckDB oracle computes (1 - distinct/total)."""
    from idd_hw6_record_linkage_spark.functions import text_analysis as TA

    rows = [
        (0, None),
        (1, ""),
        (2, "one two"),                    # < 3 tokens
        (3, "a b c a b c a b c"),          # 7 trigrams, 3 distinct
        (4, "one two three four"),         # all unique
        (5, "A B c a b C"),                # case-folds to repeats
    ]
    df = spark.createDataFrame(rows, "i int, text string")
    got = {
        r.i: r.rep
        for r in df.select(
            "i", TA.repetition_ratio_expr("text").alias("rep")
        ).collect()
    }
    assert got[0] == 0.0
    assert got[1] == 0.0
    assert got[2] == 0.0
    assert got[3] == 1.0 - 3 / 7
    assert got[4] == 0.0
    assert got[5] == 1.0 - 3 / 4  # 4 trigrams: 'a b c' twice, + 2


def test_reject_reason_expr_all_rules(spark):
    """Each rule of the composed quality filter fires, in order, on a
    crafted row; rule order means an early reject masks later ones."""
    from idd_hw6_record_linkage_spark.functions import text_analysis as TA

    good = ("the data pipeline reads a table and the job writes the "
            "result to storage while the scheduler keeps track of it")
    rows = [
        (0, good),                                   # keep
        (1, "tiny"),                                 # too_short
        (2, None),                                   # NULL -> too_short
        (3, "x" * 30000),                            # too_long
        (4, "the " + ". , ! ? - " * 20 + "the end of it"),   # high_punct
        (5, "zqx wvb jkl " * 12),                    # low_stopword
        (6, ("the cat sat on the mat and " * 20) + "the cat sat"),  # repetition
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: r["reason"]
        for r in df.select(
            "doc_id", TA.reject_reason_expr("text").alias("reason")
        ).collect()
    }
    assert got[0] is None
    assert got[1] == "too_short"
    assert got[2] == "too_short"
    assert got[3] == "too_long"
    assert got[4] == "high_punct"
    assert got[5] == "low_stopword"
    assert got[6] == "high_repetition", got[6]
