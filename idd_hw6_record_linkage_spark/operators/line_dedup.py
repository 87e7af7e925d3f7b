"""Line-level (boilerplate) dedup across a document corpus.

The CCNet / C4 curation stage the reference's record-level dedup
family does not cover: a *line* that recurs across many distinct
documents (cookie banners, nav bars, copyright footers) is boilerplate
and is stripped from every document, independently of whether the
documents themselves are near-duplicates. Reference scope anchor:
the corpus-hygiene family around scripts/blocking_*.py operates on
whole records; this operator is the intra-record complement a
web-scale corpus needs before tokenization.

Scale shape (100 TB): explode to (doc, line_no, line_key) — a map-side
op; ONE shuffle to count distinct docs per line key; the boilerplate
set (keys with doc_freq >= min_docs) is tiny relative to the corpus,
so it broadcasts back and the strip is a map-side anti-join; the
rebuild groups by doc_id (second shuffle, same width as the corpus).
Line keys are 64-bit hashes (``base="xxhash64"``) so the count shuffle
carries 8 bytes per line, not the line text; ``base="md5_60"`` is the
DuckDB-reproducible basis the value-exact contract oracle uses
(first 60 md5 bits, same trick as the minhash family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["split_lines", "line_doc_freq", "remove_boilerplate_lines"]


def _line_key(col: F.Column, base: str) -> F.Column:
    if base == "xxhash64":
        return F.xxhash64(col)
    if base == "md5_60":
        # DuckDB-reproducible basis (same trick as minhash
        # base_hashes_md5): first 15 hex chars = 60 bits, inside long
        # range on both engines — DuckDB side is
        # ('0x' || substr(md5(x),1,15))::BIGINT.
        return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
    raise ValueError(f"base must be 'xxhash64' or 'md5_60': {base}")


def split_lines(
    df: DataFrame, id_col: str, text_col: str, sep: str = "\n"
) -> DataFrame:
    """Explode documents into (id, line_no, line) preserving order.
    ``sep`` is a regex (Spark split semantics). Blank/whitespace-only
    lines are kept here (the rebuild must preserve them); frequency
    counting filters them out downstream."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("line_no", "line"),
    )


def line_doc_freq(
    lines: DataFrame,
    id_col: str,
    base: str = "xxhash64",
    min_len: int = 1,
) -> DataFrame:
    """Distinct-document frequency per trimmed line: (line_key,
    doc_freq). Whitespace-only and sub-``min_len`` lines never count.
    One shuffle, keyed on the 8-byte line hash."""
    trimmed = F.trim(F.col("line"))
    return (
        lines.where(F.length(trimmed) >= min_len)
        .select(F.col(id_col), _line_key(trimmed, base).alias("line_key"))
        .groupBy("line_key")
        .agg(F.count_distinct(F.col(id_col)).alias("doc_freq"))
    )


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "\n",
    min_docs: int = 2,
    base: str = "xxhash64",
    broadcast_boiler: bool = True,
) -> DataFrame:
    """Strip every line that occurs in >= ``min_docs`` distinct
    documents; return one row per input document:
    (id, n_lines, n_removed, clean_text) with surviving lines rejoined
    in original order by ``join_sep`` = first char of ``sep`` if it is
    a literal single char, else '\\n'.

    The boilerplate key set is broadcast (it is the head of the line
    frequency distribution — bounded by the number of distinct
    boilerplate strings, not the corpus), so the strip adds no shuffle;
    only the per-doc rebuild groups. NULL text is coalesced to the
    empty string before the split, so a NULL-text document is KEPT
    with n_lines=1, n_removed=0, clean_text='' (``F.split(NULL)`` is
    NULL and posexplode of NULL emits zero rows — without the coalesce
    the groupBy output would silently drop the document).

    The line explode runs twice (under the freq agg and under the
    strip) — deliberate: both are map-side re-derivations from the
    scan, cheaper at corpus scale than materializing the exploded
    line table (see span_dedup.span_dup_stats for the same call)."""
    join_sep = sep if len(sep) == 1 else "\n"
    lines = split_lines(
        df.withColumn(text_col, F.coalesce(F.col(text_col), F.lit(""))),
        id_col,
        text_col,
        sep,
    )
    keyed = lines.withColumn("line_key", _line_key(F.trim(F.col("line")), base))
    boiler = (
        line_doc_freq(lines, id_col, base=base)
        .where(F.col("doc_freq") >= min_docs)
        .select("line_key")
    )
    # broadcast_boiler=False is the escape hatch for adversarial
    # corpora where the boilerplate set itself is huge (a low
    # min_docs over a templated corpus): fall back to a shuffled
    # hash join instead of building the set on the driver.
    if broadcast_boiler:
        boiler = F.broadcast(boiler)
    flagged = keyed.join(
        boiler.withColumn("is_boiler", F.lit(True)),
        "line_key",
        "left",
    ).withColumn("is_boiler", F.coalesce("is_boiler", F.lit(False)))
    return flagged.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(F.col("is_boiler").cast("long")).cast("long").alias("n_removed"),
        F.concat_ws(
            join_sep,
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("is_boiler"),
                            F.struct(F.col("line_no"), F.col("line")),
                        )
                    )
                ),
                lambda s: s["line"],
            ),
        ).alias("clean_text"),
    )
