"""Unigram language-model quality scoring — the CCNet/LLaMA-style
"how typical is this document of the corpus" perplexity signal,
reduced to its distributable core: fit a Laplace-smoothed unigram LM
over a (reference) corpus, then score every document by per-token
cross-entropy against it. Real pipelines fit the LM on a trusted
corpus (e.g. Wikipedia) and keep low-perplexity web pages; the
operator takes the reference corpus as an explicit argument so both
shapes (trusted-reference and self-scored) fall out.

Scale shape:
- fit: tokenize map-only → ONE shuffle (token groupBy count); the
  (total_tokens, vocab_size) pair is a single aggregated row to the
  driver — the token table itself stays distributed.
- score: explode doc tokens → hash LEFT join against the vocab table
  on the token key (NOT broadcast by default: a web-corpus vocabulary
  grows into the 10^8-10^9 range and must shuffle; pass
  ``broadcast_model=True`` when the vocab is known-small, e.g. a
  capped top-K vocabulary) → per-doc avg. OOV tokens take the
  smoothing mass, so scoring is total: no token drops a row.

Everything is native expressions (ln/avg/count), so a DuckDB oracle
recomputes the exact pipeline (`lm_cross_entropy` contract query).
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.functions.text_analysis import tokens_expr

__all__ = ["UnigramLM", "fit_unigram_lm", "lm_score"]


class UnigramLM(NamedTuple):
    """Fitted model: a distributed (token, log_prob) table plus the
    scalar OOV log-probability every unseen token receives."""

    vocab: DataFrame  # columns: token (string), log_prob (double)
    oov_log_prob: float
    total_tokens: int
    vocab_size: int
    alpha: float


def fit_unigram_lm(
    corpus: DataFrame,
    text_col: str = "text",
    alpha: float = 0.5,
) -> UnigramLM:
    """Laplace(alpha)-smoothed unigram LM over whitespace tokens:
    log p(w) = ln(c_w + alpha) - ln(N + alpha * (V + 1)), with one
    reserved OOV slot (the +1) so unseen tokens get ln(alpha) - ln(Z).
    NULL/blank documents contribute nothing."""
    if alpha <= 0:
        raise ValueError("alpha must be > 0 (Laplace smoothing mass)")
    toks = (
        corpus.where(F.col(text_col).isNotNull())
        .select(F.explode(tokens_expr(text_col)).alias("token"))
    )
    counts = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    # One aggregated row to the driver — the scalars parameterize the
    # per-token expression below; the counts table stays distributed.
    row = counts.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("n"),
        F.count("*").alias("v"),
    ).collect()[0]
    n, v = int(row["n"]), int(row["v"])
    if n == 0:
        raise ValueError("corpus has no tokens — cannot fit a unigram LM")
    import math

    log_z = math.log(n + alpha * (v + 1))
    vocab = counts.select(
        "token",
        (F.log(F.col("cnt") + F.lit(alpha)) - F.lit(log_z)).alias("log_prob"),
    )
    return UnigramLM(
        vocab=vocab,
        oov_log_prob=math.log(alpha) - log_z,
        total_tokens=n,
        vocab_size=v,
        alpha=alpha,
    )


def lm_score(
    docs: DataFrame,
    model: UnigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = False,
) -> DataFrame:
    """One row per input document: (id, n_tokens, cross_entropy,
    log_ppl) where cross_entropy is avg(-log p(token)) in nats and
    log_ppl == cross_entropy (kept as an alias column for readers who
    think in perplexity; ppl = e^cross_entropy, left unexponentiated
    to stay numerically tame). Documents with no tokens (NULL/blank
    text) are KEPT with n_tokens = 0 and NULL entropy — a filter
    can't silently lose them."""
    vocab = model.vocab
    if broadcast_model:
        vocab = F.broadcast(vocab)
    doc_toks = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.explode(tokens_expr(text_col)).alias("token")
    )
    per_doc = (
        doc_toks.join(vocab, "token", "left")
        .select(
            id_col,
            F.coalesce("log_prob", F.lit(model.oov_log_prob)).alias("lp"),
        )
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.avg(-F.col("lp")).alias("cross_entropy"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.col("cross_entropy"),
            F.col("cross_entropy").alias("log_ppl"),
        )
    )
