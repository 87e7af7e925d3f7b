"""Fixed-token document chunking with overlap — the splitter stage
of a training-data / retrieval pipeline: break each document into
windows of ``chunk_tokens`` whitespace tokens advancing by
``chunk_tokens - overlap``, so adjacent chunks share ``overlap``
tokens of context. Every LM-pretraining packer and RAG indexer has
this step; the reference (a two-source linkage pipeline) has nothing
like it, and Spark has no built-in.

Pinned semantics (engine-reproducible, no tokenizer dependency):
- tokens are the non-empty ``\\s+`` splits of trim(text) — the same
  basis as the token-count/vocab queries, so chunk token counts sum
  consistently with text_token_count;
- chunk k (0-based) covers tokens [k*stride, k*stride + chunk_tokens)
  with stride = chunk_tokens - overlap; the last chunk may be short;
- the number of chunks for an n-token document is
  ceil((n - overlap) / stride) — at least 1 for any n > 0 (pure
  integer arithmetic, so any SQL engine replays it bit-for-bit);
- documents with NULL/empty text emit ZERO chunks (a chunker's
  output feeds tokenization; an empty chunk is a row that every
  downstream stage must special-case — callers who need the empty
  docs keep them from the source table);
- output: (id, chunk_id, tok_start, n_tokens, chunk_text) with
  tok_start the 0-based token offset and chunk_text the
  space-rejoined window (single-space normalized by construction).

Scale shape: 100% native (split → sequence → transform → posexplode
→ slice → array_join), map-only — zero shuffles, whole-stage
codegen; the fan-out per row is n/stride chunks, bounded by the
document length the upstream hygiene stages already cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["chunk_documents"]


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """See module docstring. ``0 <= overlap < chunk_tokens``."""
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive: {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap}"
        )
    stride = chunk_tokens - overlap
    toks = F.filter(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda t: t != "",
    )
    n = F.size(toks)
    # ceil((n - overlap) / stride), floored at 1 for non-empty docs —
    # pure integer arithmetic on both engines.
    n_chunks = F.greatest(
        (n - F.lit(overlap) + F.lit(stride - 1)) / F.lit(stride),
        F.lit(1),
    ).cast("int")
    d = df.select(
        F.col(id_col).alias("id"),
        toks.alias("__toks"),
        n.alias("__n"),
        n_chunks.alias("__k"),
    ).where(F.col("__n") > 0)
    exploded = d.select(
        "id",
        "__toks",
        "__n",
        F.posexplode(F.sequence(F.lit(0), F.col("__k") - 1)).alias(
            "chunk_id", "__kk"
        ),
    )
    start = F.col("chunk_id") * stride  # 0-based token offset
    window = F.slice(F.col("__toks"), start + 1, chunk_tokens)
    return exploded.select(
        "id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        start.cast("long").alias("tok_start"),
        F.size(window).cast("int").alias("n_tokens"),
        F.array_join(window, " ").alias("chunk_text"),
    )
