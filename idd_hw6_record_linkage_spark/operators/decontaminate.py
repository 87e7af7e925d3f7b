"""Train/test contamination detection (benchmark decontamination) —
the pre-training hygiene step the LLM literature mandates (GPT-3
appendix C; Lee et al. 2022; Llama/FineWeb decontamination): flag
every training document that contains ANY ``window``-token span from
a benchmark/eval probe set verbatim, so evaluation data can be
scrubbed from the training corpus before it leaks into the model.

Distinct from span_dedup: that finds spans duplicated WITHIN one
corpus (both sides huge, shuffle join); here the probe side is a
benchmark — thousands of documents against a 10^12-doc corpus — so
the probe window-hash set is tiny and BROADCASTS. The corpus-side
window explode is then a map-side probe (no shuffle of the exploded
window table at all); the only corpus-wide shuffle is the per-doc
rollup. ``broadcast_probes=False`` is the escape hatch for adversarial
probe sets too large to broadcast (falls back to a shuffled hash
join — the span_dedup shape).

No false negatives for shared spans >= ``window`` tokens when
``stride=1`` (every alignment of the corpus text is hashed; probe
windows always use stride 1). A corpus-side ``stride > 1`` trades
recall for explode volume: a shared span shorter than
``window + stride - 1`` tokens can straddle two sampled windows and
be missed — documented, tested, and OFF by default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.operators.span_dedup import token_windows

__all__ = ["contamination_stats", "probe_leak_report"]


def contamination_stats(
    docs: DataFrame,
    probes: DataFrame,
    id_col: str,
    text_col: str,
    probe_id_col: str,
    probe_text_col: str,
    window: int = 13,
    stride: int = 1,
    base: str = "xxhash64",
    broadcast_probes: bool = True,
) -> DataFrame:
    """One row per input document: (id, n_windows, n_contaminated,
    is_contaminated) where a window is contaminated iff its hash
    occurs among the probe set's windows. Documents shorter than
    ``window`` tokens (or NULL text) are kept with zero windows and
    is_contaminated = false — they cannot contain a full span."""
    probe_wins = (
        token_windows(probes, probe_id_col, probe_text_col, window, 1, base)
        .select("win_key")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    if broadcast_probes:
        probe_wins = F.broadcast(probe_wins)
    doc_wins = token_windows(docs, id_col, text_col, window, stride, base)
    per_doc = (
        doc_wins.join(probe_wins, "win_key", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_windows"),
            F.coalesce(F.sum("__hit"), F.lit(0))
            .cast("long")
            .alias("n_contaminated"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_windows", F.lit(0)).cast("long").alias("n_windows"),
            F.coalesce("n_contaminated", F.lit(0))
            .cast("long")
            .alias("n_contaminated"),
            (F.coalesce("n_contaminated", F.lit(0)) > 0).alias(
                "is_contaminated"
            ),
        )
    )


def probe_leak_report(
    docs: DataFrame,
    probes: DataFrame,
    id_col: str,
    text_col: str,
    probe_id_col: str,
    probe_text_col: str,
    window: int = 13,
    base: str = "xxhash64",
    broadcast_probes: bool = True,
) -> DataFrame:
    """The probe-side view: per benchmark document, how many corpus
    documents contain at least one of its windows — (probe_id,
    n_leaked_docs). The eval-suite owner's report: which benchmark
    items are burned. Corpus windows are semi-joined against the
    (broadcast) probe windows FIRST, so only matching windows — a
    vanishing fraction of the corpus — reach the per-probe rollup
    shuffle."""
    probe_wins = token_windows(
        probes, probe_id_col, probe_text_col, window, 1, base
    ).select(F.col(probe_id_col).alias("__probe"), "win_key")
    probe_keys = probe_wins.select("win_key").distinct()
    if broadcast_probes:
        probe_keys = F.broadcast(probe_keys)
    doc_wins = token_windows(docs, id_col, text_col, window, 1, base)
    hits = (
        doc_wins.join(probe_keys, "win_key")  # map-side when broadcast
        .select("win_key", F.col(id_col).alias("__doc"))
        .distinct()
    )
    return (
        probe_wins.join(hits, "win_key")
        .groupBy("__probe")
        .agg(F.count_distinct("__doc").cast("long").alias("n_leaked_docs"))
        .select(F.col("__probe").alias(probe_id_col), "n_leaked_docs")
    )
