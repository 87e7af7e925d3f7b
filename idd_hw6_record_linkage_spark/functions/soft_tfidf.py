"""Soft-TF-IDF hybrid token-set similarity (Cohen, Ravikumar &
Fienberg, IIWeb 2003) — the third classic hybrid next to Monge-Elkan
and token-set Jaccard: tokens are weighted by corpus IDF (a shared
rare surname outweighs a shared stopword) AND matched approximately
(an inner character similarity with a threshold absorbs per-token
typos). The reference's comparator set (record_linkage.py:271-381)
has neither corpus weighting nor hybrid matching; this completes the
SecondString family the ER literature treats as standard.

Variant note: the classical definition pairs each left token with its
argmax-similarity right token and multiplies that token's weight; ties
in the inner similarity make the argmax engine-dependent. This
implementation uses the JOINT-max form —
  soft(A, B) = Σ_{x∈A} w(x) · max_{y∈B} [ sim(x,y) ≥ θ ?
                                           sim(x,y) · w(y) : ∅ ]
— maximizing the weighted similarity directly, which is deterministic,
identical in Spark and DuckDB (so the contract oracle is value-exact),
and coincides with the classical form whenever the argmax is unique.

Weights: w(t, A) = v / ||v||₂ with v(t, A) = ln(tf+1) · ln(N/df) — the
SecondString TF-IDF. The weight arrays are built ONCE per corpus by
:func:`doc_token_weights` (two hash aggregates + one join — the df
table is the only corpus-wide state, exactly the shape TF-IDF cosine
already uses) and SORTED BY TOKEN, so every downstream fold
(normalization, the comparator sum) runs in the same order in both
engines — float-identical results, same discipline as monge_elkan's
list_sum/aggregate pairing.

Comparator execution is a pure Catalyst expression
(transform/array_max/aggregate higher-order functions, zero Python),
map-only over an existing pair table; cost is O(|A|·|B|) per pair, so
callers slice token arrays first (the contract query keeps 6).

Edge semantics (identical in Spark, SQL and the scalar replica):
NULL weight array on either side → NULL; EMPTY array on either side →
0.0 (no token evidence — note this differs from Monge-Elkan's
both-empty→1.0, because soft-TF-IDF is evidence-weighted: two empty
docs share no weighted evidence). Identical non-degenerate docs score
1.0 up to float rounding (Σ w² = 1 by normalization).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.functions.monge_elkan import (
    _inner_lev_sql,
    norm_lev_sim,
)

__all__ = [
    "doc_token_weights",
    "soft_tfidf",
    "soft_tfidf_sql",
    "doc_token_weights_sql",
    "soft_tfidf_py",
]


def doc_token_weights(
    docs: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "toks",
    n_docs: int | None = None,
) -> DataFrame:
    """(id, array<string>) → (id, wtoks: array<struct<tok,w>>), tokens
    deduplicated (tf folded into the weight), sorted by token, weights
    L2-normalized per doc. ``n_docs`` defaults to ``docs.count()`` —
    pass it when the caller already knows the corpus size (saves a
    job). Docs whose token array is NULL produce no row (callers left
    join and let the comparator yield NULL)."""
    if n_docs is None:
        n_docs = docs.count()
    ex = docs.select(
        F.col(id_col).alias("__id"), F.explode(tokens_col).alias("tok")
    )
    tf = ex.groupBy("__id", "tok").agg(F.count("*").alias("tf"))
    df = tf.groupBy("tok").agg(F.count("*").alias("df"))
    v = tf.join(df, "tok").select(
        "__id",
        "tok",
        (
            F.log(F.col("tf").cast("double") + 1.0)
            * F.log(F.lit(float(n_docs)) / F.col("df").cast("double"))
        ).alias("v"),
    )
    arr = v.groupBy("__id").agg(
        F.sort_array(F.collect_list(F.struct("tok", "v"))).alias("__arr")
    )
    norm = F.sqrt(
        F.aggregate(
            "__arr", F.lit(0.0), lambda acc, x: acc + x["v"] * x["v"]
        )
    )
    return arr.select(
        F.col("__id").alias(id_col),
        F.transform(
            "__arr",
            lambda x: F.struct(
                x["tok"].alias("tok"),
                F.when(norm > 0, x["v"] / norm).otherwise(F.lit(0.0)).alias("w"),
            ),
        ).alias("wtoks"),
    )


def soft_tfidf(
    a: Column | str,
    b: Column | str,
    threshold: float = 0.9,
    inner=norm_lev_sim,
) -> Column:
    """soft-TF-IDF(a → b) over two array<struct<tok,w>> columns, fully
    native. ``inner`` is an expression builder (Column, Column) →
    Column, inlined into the transform lambdas (same contract as
    monge_elkan's inner)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    th = F.lit(float(threshold))

    def contrib(x):
        best = F.array_max(
            F.transform(
                b,
                lambda y: F.when(
                    inner(x["tok"], y["tok"]) >= th,
                    inner(x["tok"], y["tok"]) * y["w"],
                ),
            )
        )
        return F.coalesce(x["w"] * best, F.lit(0.0))

    total = F.aggregate(a, F.lit(0.0), lambda acc, x: acc + contrib(x))
    return (
        F.when(a.isNull() | b.isNull(), F.lit(None).cast("double"))
        .when((F.size(a) == 0) | (F.size(b) == 0), F.lit(0.0))
        .otherwise(total)
    )


def doc_token_weights_sql(
    source_cte: str, id_expr: str, tokens_expr: str, n_docs_expr: str
) -> str:
    """DuckDB CTE bundle replicating :func:`doc_token_weights` over a
    named CTE ``source_cte`` with an id expression and an
    array<string> expression. Returns SQL text for three chained CTEs
    ending in ``wts(__id, wtoks)`` — splice into a WITH clause. The
    weight list is built ORDER BY tok and the norm comes from
    list_sum over the same list, matching Spark's sort_array +
    in-order fold exactly."""
    return f"""
__ex AS (
  SELECT {id_expr} AS __id, unnest({tokens_expr}) AS tok
  FROM {source_cte}
), __tf AS (
  SELECT __id, tok, count(*) AS tf FROM __ex GROUP BY 1, 2
), __df AS (
  SELECT tok, count(*) AS df FROM __tf GROUP BY 1
), __v AS (
  SELECT __id, __tf.tok,
         ln(CAST(tf AS DOUBLE) + 1.0)
         * ln(CAST({n_docs_expr} AS DOUBLE) / CAST(df AS DOUBLE)) AS v
  FROM __tf JOIN __df ON __tf.tok = __df.tok
), __arr AS (
  SELECT __id,
         list(struct_pack(tok := tok, v := v) ORDER BY tok) AS arr
  FROM __v GROUP BY 1
), wts AS (
  SELECT __id,
         list_transform(
           arr,
           x -> struct_pack(
             tok := x.tok,
             w := CASE WHEN sqrt(list_sum(
                          list_transform(arr, e -> e.v * e.v))) > 0
                  THEN x.v / sqrt(list_sum(
                          list_transform(arr, e -> e.v * e.v)))
                  ELSE 0.0 END)
         ) AS wtoks
  FROM __arr
)"""


def soft_tfidf_sql(a: str, b: str, threshold: float = 0.9) -> str:
    """DuckDB scalar SQL expression for :func:`soft_tfidf` with the
    normalized-Levenshtein inner — value-exact vs the Spark expression
    (same inner, same in-order fold over the token-sorted list)."""
    th = repr(float(threshold))
    sim = _inner_lev_sql("x.tok", "y.tok")
    best = (
        f"list_max(list_transform({b}, y -> "
        f"CASE WHEN {sim} >= {th} THEN {sim} * y.w END))"
    )
    contrib = f"coalesce(x.w * {best}, 0.0)"
    total = f"list_sum(list_transform({a}, x -> {contrib}))"
    return (
        f"(CASE WHEN {a} IS NULL OR {b} IS NULL THEN NULL "
        f"WHEN len({a}) = 0 OR len({b}) = 0 THEN 0.0 "
        f"ELSE {total} END)"
    )


def soft_tfidf_py(a, b, threshold: float = 0.9, inner=None) -> float | None:
    """Scalar reference replica (tests only). ``a``/``b`` are lists of
    (tok, w) pairs sorted by tok; ``inner`` a (str, str) → float."""
    if inner is None:

        def inner(x: str, y: str) -> float:
            m = max(len(x), len(y))
            if m == 0:
                return 1.0
            prev = list(range(len(y) + 1))
            for i, cx in enumerate(x, 1):
                cur = [i]
                for j, cy in enumerate(y, 1):
                    cur.append(
                        min(
                            prev[j] + 1,
                            cur[j - 1] + 1,
                            prev[j - 1] + (cx != cy),
                        )
                    )
                prev = cur
            return 1.0 - prev[-1] / m
    if a is None or b is None:
        return None
    if not a or not b:
        return 0.0
    total = 0.0
    for tok, w in a:
        cand = [
            inner(tok, t2) * w2
            for t2, w2 in b
            if inner(tok, t2) >= threshold
        ]
        if cand:
            total += w * max(cand)
    return total
