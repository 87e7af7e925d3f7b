"""Corpus-wide duplicated token-span detection — the exact-substring
dedup family (RefinedWeb / Lee et al. "Deduplicating Training Data
Makes Language Models Better"), approximated with fixed-width rolling
token windows instead of a suffix array: a ``window``-token span whose
hash occurs in >= ``min_docs`` distinct documents is duplicated
verbatim across the corpus (no false negatives for spans >= window;
windows are the classic distributed stand-in for suffix automata,
which do not shard).

Distinct from the existing family: minhash/simhash/ngram-Jaccard judge
whole documents pairwise; text_repetition is intra-document. This
operator finds *cross-document verbatim spans* and scores each doc by
how much of it is copied text — the signal used to cut boilerplate-
heavy and template-generated pages before training.

Scale shape: tokenize once (map-only), explode windows (row growth
x ~n_tokens/stride), ONE shuffle to doc-freq the 8-byte window hashes,
then a hash join of windows against the duplicated-hash set — NOT a
broadcast: unlike boilerplate lines, the duplicated-span set grows
with the corpus. Per-doc rollup groups by doc (second shuffle).
``base="md5_60"`` gives the DuckDB-reproducible contract basis,
``xxhash64`` the production default (same pattern as line_dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["token_windows", "span_doc_freq", "span_dup_stats"]


def _win_key(col: F.Column, base: str) -> F.Column:
    if base == "xxhash64":
        return F.xxhash64(col)
    if base == "md5_60":
        return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
    raise ValueError(f"base must be 'xxhash64' or 'md5_60': {base}")


def token_windows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 20,
    stride: int = 1,
    base: str = "xxhash64",
) -> DataFrame:
    """(id, win_no, win_key) for every ``window``-token rolling span
    at the given stride. Tokens = whitespace-split of trimmed text
    (the corpus tokenization used by the text_analysis family). Docs
    shorter than ``window`` tokens emit no rows."""
    if window < 1 or stride < 1:
        raise ValueError(f"window/stride must be >= 1: {window}/{stride}")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # Stage the token array as a real column before the window
    # transform: HOF lambdas evaluate interpreted, and slice(<split
    # expression>, ...) in the lambda body would re-split the full
    # text once per WINDOW (~n_tokens/stride times per doc). With the
    # staged attribute the per-window work is the slice+hash only;
    # CollapseProject keeps the multi-referenced non-cheap alias in
    # its own projection.
    staged = df.where(
        F.col(text_col).isNotNull() & (F.size(toks) >= F.lit(window))
    ).select(F.col(id_col), toks.alias("__toks"))
    tcol = F.col("__toks")
    starts = F.sequence(
        F.lit(0),
        F.floor((F.size(tcol) - window) / stride).cast("int"),
    )
    return staged.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                starts,
                lambda i: _win_key(
                    F.concat_ws(
                        " ", F.slice(tcol, i * stride + 1, window)
                    ),
                    base,
                ),
            )
        ).alias("win_no", "win_key"),
    )


def span_doc_freq(windows: DataFrame, id_col: str) -> DataFrame:
    """Distinct-document frequency per window key (one shuffle on the
    8-byte key)."""
    return windows.groupBy("win_key").agg(
        F.count_distinct(F.col(id_col)).alias("doc_freq")
    )


def span_dup_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 20,
    stride: int = 1,
    min_docs: int = 2,
    base: str = "xxhash64",
    freq: DataFrame | None = None,
) -> DataFrame:
    """Per-document duplicated-span profile: (id, n_windows,
    n_dup_windows, dup_ratio) where a window is duplicated iff its
    span hash occurs in >= ``min_docs`` distinct docs. Documents with
    fewer than ``window`` tokens (or NULL text) are kept with zero
    windows and ratio 0.0 — they carry no verbatim-copy evidence.

    DELIBERATE two-pass shape: the window explode runs twice (once
    under the doc-freq aggregation, once under the join) because the
    exploded window table is ~window/stride × the corpus — caching it
    costs more than re-deriving it from the scan, and the two
    consumers shuffle different projections so Spark cannot reuse one
    Exchange. In a multi-job production pipeline, compute
    ``span_doc_freq`` once, persist THAT (it is the aggregated, much
    smaller table), and pass it as ``freq``."""
    wins = token_windows(df, id_col, text_col, window, stride, base)
    if freq is None:
        freq = span_doc_freq(wins, id_col)
    # Join against ONLY the duplicated subset of the frequency table
    # (doc_freq >= min_docs — typically a small fraction of distinct
    # windows), never the full table: every window matches a full-freq
    # join, so its build side would be the entire distinct-window set.
    # A LEFT join + conditional sum keeps n_windows computable in the
    # same pass while the join's right side shrinks from |distinct
    # windows| to |duplicated windows|.
    dup_keys = freq.where(F.col("doc_freq") >= min_docs).select(
        "win_key", F.lit(1).alias("__dup")
    )
    per_doc = (
        wins.join(dup_keys, "win_key", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_windows"),
            F.coalesce(F.sum("__dup"), F.lit(0))
            .cast("long")
            .alias("n_dup_windows"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_windows", F.lit(0)).cast("long").alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0))
            .cast("long")
            .alias("n_dup_windows"),
            F.round(
                F.when(
                    F.coalesce("n_windows", F.lit(0)) > 0,
                    F.col("n_dup_windows")
                    / F.col("n_windows").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_ratio"),
        )
    )
