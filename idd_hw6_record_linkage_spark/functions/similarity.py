"""Pairwise comparators (SURVEY §2.6, C1-C8).

Native Catalyst expressions wherever Spark has the primitive
(levenshtein, exact, gaussian numeric, token jaccard, cosine); Arrow-
batched pandas UDFs only for Jaro / Jaro-Winkler, which Spark lacks.
The UDFs receive whole Arrow batches (no per-row Python at the Spark
level) and loop in compiled-ish numpy/py inside the batch — the same
strategy the reference gets from the `recordlinkage` library's numpy
comparators (record_linkage.py:457).

Reference comparator configs (thresholds) live in
/root/reference/scripts/record_linkage/record_linkage.py:271-381.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# --- native comparators -----------------------------------------------------


def sim_exact(l: Column | str, r: Column | str) -> Column:  # noqa: E741
    """C4 exact match → 0.0/1.0; null-safe like recordlinkage
    compare.exact (missing → 0)."""
    lc, rc = _c(l), _c(r)
    return (
        F.when(lc.isNull() | rc.isNull(), F.lit(0.0))
        .otherwise(lc.eqNullSafe(rc).cast("double"))
    )


def sim_gauss(l: Column | str, r: Column | str, scale: float) -> Column:  # noqa: E741
    """C5 Gaussian numeric kernel: 2^(-(d/scale)^2), recordlinkage
    'gauss' method (record_linkage.py:292-295). Missing → 0."""
    lc, rc = _c(l).cast("double"), _c(r).cast("double")
    d = (lc - rc) / F.lit(float(scale))
    return F.when(
        lc.isNull() | rc.isNull(), F.lit(0.0)
    ).otherwise(F.pow(F.lit(2.0), -(d * d)))


def sim_levenshtein(l: Column | str, r: Column | str) -> Column:  # noqa: E741
    """C3 normalized edit similarity: 1 - lev/max(len); both empty → 1,
    missing → 0. Fully native (JVM levenshtein)."""
    lc, rc = _c(l), _c(r)
    denom = F.greatest(F.length(lc), F.length(rc))
    sim = F.when(denom == 0, F.lit(1.0)).otherwise(
        F.lit(1.0) - F.levenshtein(lc, rc) / denom.cast("double")
    )
    return F.when(lc.isNull() | rc.isNull(), F.lit(0.0)).otherwise(sim)


def sim_jaccard_tokens(l: Column | str, r: Column | str) -> Column:  # noqa: E741
    """C6 token-set Jaccard over whitespace tokens (2_train_models.py:
    276-287 analogue). Native array ops."""
    lt = F.array_distinct(F.split(F.trim(_c(l)), r"\s+"))
    rt = F.array_distinct(F.split(F.trim(_c(r)), r"\s+"))
    inter = F.size(F.array_intersect(lt, rt)).cast("double")
    union = F.size(F.array_union(lt, rt)).cast("double")
    sim = F.when(union == 0, F.lit(0.0)).otherwise(inter / union)
    return F.when(_c(l).isNull() | _c(r).isNull(), F.lit(0.0)).otherwise(sim)


def sim_jaccard_token_arrays(l: Column | str, r: Column | str) -> Column:  # noqa: E741
    """C6 over *pre-tokenized* distinct-token array columns. Tokenize
    once per record upstream instead of twice per candidate pair — at
    millions of pairs the per-pair split/distinct dominates otherwise."""
    lt, rt = _c(l), _c(r)
    inter = F.size(F.array_intersect(lt, rt)).cast("double")
    union = F.size(F.array_union(lt, rt)).cast("double")
    sim = F.when(union == 0, F.lit(0.0)).otherwise(inter / union)
    return F.when(lt.isNull() | rt.isNull(), F.lit(0.0)).otherwise(sim)


def sim_cosine_arrays(l: Column | str, r: Column | str) -> Column:  # noqa: E741
    """Cosine similarity between two array<float/double> columns —
    native zip_with + aggregate (no UDF)."""
    lc, rc = _c(l), _c(r)
    dot = F.aggregate(
        F.zip_with(lc, rc, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nl = F.sqrt(F.aggregate(lc, F.lit(0.0), lambda acc, x: acc + x * x))
    nr = F.sqrt(F.aggregate(rc, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.when((nl == 0) | (nr == 0), F.lit(0.0)).otherwise(dot / (nl * nr))


def thresholded(sim: Column, threshold: float) -> Column:
    """recordlinkage `threshold=` semantics: 1.0 if sim >= t else 0.0
    (record_linkage.py:280-289)."""
    return (sim >= F.lit(float(threshold))).cast("double")


# --- Jaro / Jaro-Winkler (pandas UDF; Spark has no native) -------------------


def _jaro(s1: str, s2: str) -> float:
    """Standard Jaro similarity (jellyfish-compatible), scalar."""
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    match_dist = max(len1, len2) // 2 - 1
    if match_dist < 0:
        match_dist = 0
    flags1 = [False] * len1
    flags2 = [False] * len2
    matches = 0
    for i, ch in enumerate(s1):
        lo = max(0, i - match_dist)
        hi = min(i + match_dist + 1, len2)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == ch:
                flags1[i] = True
                flags2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    k = 0
    for i in range(len1):
        if flags1[i]:
            while not flags2[k]:
                k += 1
            if s1[i] != s2[k]:
                transpositions += 1
            k += 1
    t = transpositions / 2
    m = matches
    return (m / len1 + m / len2 + (m - t) / m) / 3


def _jaro_winkler(s1: str, s2: str, prefix_weight: float = 0.1) -> float:
    """Jaro-Winkler with the standard 0.7 boost threshold and 4-char
    prefix cap (jellyfish-compatible, cf. SURVEY §7 risk 5)."""
    j = _jaro(s1, s2)
    if j > 0.7:
        prefix = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a == b:
                prefix += 1
            else:
                break
        j += prefix * prefix_weight * (1 - j)
    return j


@pandas_udf(DoubleType())
def jaro_udf(s1: pd.Series, s2: pd.Series) -> pd.Series:
    """C2 Jaro similarity over an Arrow batch; missing → 0.0."""
    out = [
        0.0 if (a is None or b is None) else _jaro(a, b)
        for a, b in zip(s1.tolist(), s2.tolist())
    ]
    return pd.Series(out, dtype="float64")


try:  # optional fast path: C-implemented JW when rapidfuzz is present.
    # Corner-case parity caveat (SURVEY §7 risk 5): rapidfuzz's prefix
    # scaling differs from jellyfish in rare cases, so it is opt-in via
    # SPARK_LINKAGE_FAST_JW=1; the pure-Python implementation is the
    # parity default.
    import os as _os

    if _os.environ.get("SPARK_LINKAGE_FAST_JW") == "1":
        from rapidfuzz.distance.JaroWinkler import similarity as _fast_jw
    else:  # pragma: no cover - env-dependent
        _fast_jw = None
except ImportError:  # pragma: no cover - env-dependent
    _fast_jw = None


@pandas_udf(DoubleType())
def jaro_winkler_udf(s1: pd.Series, s2: pd.Series) -> pd.Series:
    """C1 Jaro-Winkler similarity over an Arrow batch; missing → 0.0."""
    jw = _fast_jw or _jaro_winkler
    out = [
        0.0 if (a is None or b is None) else jw(a, b)
        for a, b in zip(s1.tolist(), s2.tolist())
    ]
    return pd.Series(out, dtype="float64")


def sim_jaro(l: Column | str, r: Column | str) -> Column:  # noqa: E741
    return jaro_udf(_c(l), _c(r))


def sim_jaro_winkler(l: Column | str, r: Column | str) -> Column:  # noqa: E741
    return jaro_winkler_udf(_c(l), _c(r))
