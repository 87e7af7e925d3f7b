"""Exact-threshold set-similarity self-join via prefix filtering
(beyond reference — SURVEY §2.12; Chaudhuri et al. 2006 SSJoin /
Xiao et al. 2008 PPJoin). Finds ALL record pairs whose token-set
Jaccard similarity >= a threshold, without the O(n^2) cross product
and without the false-negative risk of MinHash-LSH: this is the exact
counterpart to ``dedup_minhash_lsh`` (probabilistic recall) and
``dedup_ngram_jaccard`` (fixed-key blocked), and the standard
distributed shape for exact-Jaccard dedup (Vernica et al. 2010's
MapReduce set-similarity join is this algorithm).

How the pruning works: order every record's tokens by a single global
canon (ascending doc-frequency, token text as tiebreak — rarest
first). If jaccard(L, R) >= t, the pigeonhole principle says L and R
must share a token within each one's first ``n - ceil(t*n) + 1``
tokens (the *prefix*) — so candidates come from an equi-join on
exploded prefix tokens only, and a frequent token (which would fan
out the join) only enters a prefix when a record has almost nothing
rarer, which is exactly when it is informative. A length filter
(``num*max(|L|,|R|) <= den*min(|L|,|R|)``) prunes before
verification; survivors are verified with the exact Jaccard.

Numeric discipline: the threshold is a RATIONAL ``num/den`` and every
comparison is integer (``ceil(n*num/den)`` = ``(n*num + den - 1) div
den``; verify is ``n_common*den >= n_union*num``) — no float ever
decides membership, so the result is value-exact across engines
(the reported ``jac`` column is a display-only rounded quotient).

Scale shape: token doc-frequencies are ONE groupBy on the token; the
per-record ordered array is a bounded collect_list (callers pass a
bounded token basis — a sliced/sanitized key, same discipline as the
q-gram/suffix key slices; this is NOT for unbounded full-document
token sets). The prefix explode emits at most ``(1-t)*n + 1`` rows
per record — at t=0.6, 40% of the token rows — and the candidate
aggregate shuffles once on the id pair. Everything is native
Catalyst (sort_array/slice/transform/array_intersect — no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def jaccard_setsim_join(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    threshold_num: int,
    threshold_den: int,
) -> DataFrame:
    """All pairs with jaccard(tokens_l, tokens_r) >= num/den over the
    DISTINCT elements of ``tokens_col`` (empty-string tokens dropped;
    records with no tokens emit no pairs). Output: (id_l, id_r,
    n_common, n_union, jac), id_l < id_r, jac rounded to 6 dp for
    display — the >= decision itself is integer-exact."""
    if not (0 < threshold_num <= threshold_den):
        raise ValueError("threshold must satisfy 0 < num/den <= 1")

    tok = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.col(tokens_col)).alias("token"),
        )
        .where(F.col("token").isNotNull() & (F.col("token") != ""))
        .distinct()
    )
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("tdf"))
    # one sorted (df, token) array per record: global rarest-first canon
    ordered = (
        tok.join(freq, "token")
        .groupBy("id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("tdf"), F.col("token")))
            ).alias("__ord")
        )
        .select(
            "id",
            F.expr("transform(__ord, x -> x.token)").alias("toks"),
            F.size("__ord").alias("n"),
        )
    )
    # prefix length n - ceil(n*num/den) + 1, all integer
    pref_len = (
        F.col("n")
        - F.floor(
            (F.col("n") * threshold_num + threshold_den - 1) / threshold_den
        )
        + 1
    ).cast("int")
    pref = ordered.select(
        "id", F.explode(F.slice("toks", F.lit(1), pref_len)).alias("token")
    )
    cand = (
        pref.select(F.col("id").alias("id_l"), "token")
        .join(pref.select(F.col("id").alias("id_r"), "token"), "token")
        .where(F.col("id_l") < F.col("id_r"))
        .select("id_l", "id_r")
        .distinct()
    )
    lhs = ordered.select(
        F.col("id").alias("id_l"),
        F.col("toks").alias("toks_l"),
        F.col("n").alias("n_l"),
    )
    rhs = ordered.select(
        F.col("id").alias("id_r"),
        F.col("toks").alias("toks_r"),
        F.col("n").alias("n_r"),
    )
    inter = F.size(F.array_intersect("toks_l", "toks_r"))
    union = F.col("n_l") + F.col("n_r") - F.col("n_common")
    return (
        cand.join(lhs, "id_l")
        .join(rhs, "id_r")
        # length filter: num*max <= den*min, else jaccard < num/den
        .where(
            F.greatest("n_l", "n_r") * threshold_num
            <= F.least("n_l", "n_r") * threshold_den
        )
        .withColumn("n_common", inter.cast("long"))
        .withColumn("n_union", union.cast("long"))
        .where(
            F.col("n_common") * threshold_den
            >= F.col("n_union") * threshold_num
        )
        .select(
            "id_l",
            "id_r",
            "n_common",
            "n_union",
            F.round(F.col("n_common") / F.col("n_union"), 6).alias("jac"),
        )
    )
