"""Cross-document duplicated token-span detection
(operators.span_dedup) on corpora where the duplicated windows are
countable by eye."""

from __future__ import annotations

import pytest

from idd_hw6_record_linkage_spark.operators import span_dedup


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "id long, text string")


def test_span_dup_stats_detects_shared_span(spark):
    # docs 1 and 2 share the verbatim 4-token span "a b c d";
    # doc 3 shares nothing at window=3.
    docs = [
        (1, "a b c d x y"),
        (2, "q a b c d z"),
        (3, "m n o p r s"),
    ]
    out = {
        r["id"]: r
        for r in span_dedup.span_dup_stats(
            _corpus(spark, docs), "id", "text", window=3
        ).collect()
    }
    # doc1 windows: abc bcd cdx dxy -> abc,bcd duplicated (in doc2)
    assert out[1]["n_windows"] == 4 and out[1]["n_dup_windows"] == 2
    assert out[1]["dup_ratio"] == 0.5
    # doc2 windows: qab abc bcd cdz -> abc,bcd duplicated
    assert out[2]["n_windows"] == 4 and out[2]["n_dup_windows"] == 2
    assert out[3]["n_dup_windows"] == 0 and out[3]["dup_ratio"] == 0.0


def test_span_window_larger_than_doc_keeps_doc_with_zero(spark):
    docs = [(1, "a b"), (2, None), (3, "a b c d e")]
    out = {
        r["id"]: r
        for r in span_dedup.span_dup_stats(
            _corpus(spark, docs), "id", "text", window=4
        ).collect()
    }
    assert set(out) == {1, 2, 3}  # short and NULL docs kept
    assert out[1]["n_windows"] == 0 and out[1]["dup_ratio"] == 0.0
    assert out[2]["n_windows"] == 0
    assert out[3]["n_windows"] == 2  # abcd bcde


def test_span_stride_skips_windows(spark):
    docs = [(1, "a b c d e f")]
    wins = span_dedup.token_windows(
        _corpus(spark, docs), "id", "text", window=2, stride=2
    )
    assert wins.count() == 3  # ab cd ef


def test_span_min_docs_threshold(spark):
    docs = [(1, "a b c"), (2, "a b c"), (3, "a b c")]
    at2 = span_dedup.span_dup_stats(
        _corpus(spark, docs), "id", "text", window=3, min_docs=2
    )
    at4 = span_dedup.span_dup_stats(
        _corpus(spark, docs), "id", "text", window=3, min_docs=4
    )
    assert all(r["n_dup_windows"] == 1 for r in at2.collect())
    assert all(r["n_dup_windows"] == 0 for r in at4.collect())


def test_span_bases_agree(spark):
    docs = [(1, "a b c d x"), (2, "z a b c d"), (3, "p q r s t")]
    df = _corpus(spark, docs)
    a = sorted(
        map(
            tuple,
            span_dedup.span_dup_stats(
                df, "id", "text", window=3, base="xxhash64"
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            span_dedup.span_dup_stats(
                df, "id", "text", window=3, base="md5_60"
            ).collect(),
        )
    )
    assert a == b


def test_span_precomputed_freq_reused(spark):
    """Passing a persisted freq table skips recomputation and gives
    the same answer — the production two-job shape."""
    docs = [(1, "a b c d x"), (2, "z a b c d"), (3, "p q r s t")]
    df = _corpus(spark, docs)
    wins = span_dedup.token_windows(df, "id", "text", window=3)
    freq = span_dedup.span_doc_freq(wins, "id").cache()
    with_freq = sorted(
        map(
            tuple,
            span_dedup.span_dup_stats(
                df, "id", "text", window=3, freq=freq
            ).collect(),
        )
    )
    without = sorted(
        map(
            tuple,
            span_dedup.span_dup_stats(df, "id", "text", window=3).collect(),
        )
    )
    freq.unpersist()
    assert with_freq == without


def test_span_rejects_bad_params(spark):
    df = _corpus(spark, [(1, "a b c")])
    with pytest.raises(ValueError, match=">= 1"):
        span_dedup.token_windows(df, "id", "text", window=0)
    with pytest.raises(ValueError, match="md5_60"):
        span_dedup.token_windows(df, "id", "text", base="sha1")
