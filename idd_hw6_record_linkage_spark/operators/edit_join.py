"""Exact-threshold edit-distance similarity self-join (PassJoin).

Beyond reference — SURVEY §2.12 blocking/join family. Emits ALL pairs
(id_l < id_r) whose keys have Levenshtein distance ≤ d, WITHOUT a
blocking key and WITHOUT a cross product — the edit-distance
counterpart to `setsim_join.jaccard_setsim_join` (token-set Jaccard)
and the exact complement to the MinHash/SimHash approximate passes.
The reference's fixed pipeline thresholds Levenshtein only inside
already-blocked candidate pairs (record_linkage.py:271-381 scores
pre-blocked pairs); a production linker also needs the standalone
"find every typo-variant pair in the corpus" join, which at 10^12
documents can never materialize the cross product.

Algorithm — PassJoin (Li, Deng, Wang, Feng, VLDB'12), the standard
partition-based exact edit join:

1. SEGMENTS (index side): each key of length l is split into d+1
   disjoint segments under a fixed even scheme (k = d+1 − l % (d+1)
   segments of length ⌊l/(d+1)⌋ first, the rest one longer). By
   pigeonhole, if lev(r, s) ≤ d then at least one segment of r is
   untouched by any edit and therefore occurs VERBATIM in s.
2. SUBSTRINGS (probe side): each key s of length m emits, for every
   plausible partner length l ∈ [m−d, m+d] (l ≥ d+1) and segment
   ordinal i, the substrings of s with segment i's exact length whose
   start position lies within ±d of segment i's home position —
   because ≤ d edits shift any alignment by at most d. (PassJoin's
   multi-match-aware selection trims this window further; the plain
   ±d window is a strict superset, so completeness — the property the
   oracle checks — is preserved, at a small constant candidate
   overhead bounded by (2d+1)²(d+1) per probe.)
3. Candidates are the equi-join of the two explodes on the composite
   key (segment ordinal, partner length, segment string) — position
   and length fragment common substrings across join keys, which is
   what keeps generic corpus text from piling onto one hot key.
4. VERIFY: distinct candidate pairs are checked with the native
   `levenshtein` (JVM, whole-stage codegen) after the |Δlen| ≤ d
   length filter. False positives die here; step 2's superset window
   guarantees no false negatives, and the contract oracle
   (`rl_edit_join`) proves it value-exactly against a brute-force
   DuckDB all-pairs join at every scale factor.

Scale shape: two narrow explodes (≤ d+1 rows/record index side,
≤ (2d+1)²(d+1) probe side), ONE hash join on a composite segment key,
one distinct, one map-side verify — no shuffle ever carries more than
the exploded segment tables, and the verify join carries only short
key slices. Keys shorter than d+1 are excluded by contract (their
segment scheme degenerates; callers wanting them can union a trivial
short-key arm where lev ≤ d holds by length alone).

Reference anchor: record_linkage.py:271-381 (Levenshtein comparator
config); setsim_join.py (same prefix-filter contract discipline).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _segment_scheme(l_col: Column, d: int) -> Column:
    """Array of (seg_i, start, len) structs (0-based start) for the
    fixed even partition of a length-``l`` key into d+1 segments:
    base = l // (d+1); the first k = d+1 − l % (d+1) segments have
    length base, the remaining l % (d+1) have base+1. start(i) =
    i·base + max(i − k, 0)."""
    base = (l_col / (d + 1)).cast("int")
    k = F.lit(d + 1) - (l_col % (d + 1)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), F.lit(d)),
        lambda i: F.struct(
            i.alias("seg_i"),
            (i * base + F.greatest(i - k, F.lit(0))).alias("start"),
            F.when(i < k, base).otherwise(base + 1).alias("seg_len"),
        ),
    )


def edit_distance_self_join(
    df: DataFrame,
    id_col: str,
    key_col: str,
    d: int = 2,
) -> DataFrame:
    """All pairs (id_l < id_r, lev) with levenshtein(key_l, key_r) ≤ d
    among keys of length ≥ d+1. Exact (no false positives or
    negatives); see module docstring for the plan shape."""
    if d < 0:
        raise ValueError(f"d must be >= 0, got {d}")
    keys = (
        df.select(F.col(id_col).alias("__id"), F.col(key_col).alias("__s"))
        .where(F.col("__s").isNotNull())
        .withColumn("__l", F.length("__s"))
        .where(F.col("__l") >= d + 1)
    )

    # index side: the d+1 segments of every key
    segs = keys.select(
        F.col("__id").alias("id_r"),
        F.col("__s").alias("s_r"),
        F.col("__l").alias("l_r"),
        F.explode(_segment_scheme(F.col("__l"), d)).alias("g"),
    ).select(
        "id_r",
        "s_r",
        "l_r",
        F.col("g.seg_i").alias("seg_i"),
        F.substring(
            F.col("s_r"), F.col("g.start") + 1, F.col("g.seg_len")
        ).alias("seg"),
    )

    # probe side: for every partner length l in [m-d, m+d] (l >= d+1)
    # and segment ordinal, the in-bounds substrings within +/-d of the
    # segment's home position
    probes = keys.select(
        F.col("__id").alias("id_l"),
        F.col("__s").alias("s_l"),
        F.col("__l").alias("m"),
        F.explode(
            F.sequence(
                F.greatest(F.col("__l") - d, F.lit(d + 1)), F.col("__l") + d
            )
        ).alias("l_r"),
    )
    probes = probes.select(
        "id_l",
        "s_l",
        "m",
        "l_r",
        F.explode(_segment_scheme(F.col("l_r"), d)).alias("g"),
    ).select(
        "id_l",
        "s_l",
        "m",
        "l_r",
        F.col("g.seg_i").alias("seg_i"),
        F.col("g.start").alias("home"),
        F.col("g.seg_len").alias("seg_len"),
    )
    probes = probes.select(
        "id_l",
        "s_l",
        "l_r",
        "seg_i",
        "seg_len",
        # NB: Spark's sequence(lo, hi) with lo > hi yields a DESCENDING
        # sequence, not an empty one — an empty position window (probe
        # too short to hold this segment in bounds) must explode NULL
        # (which drops the row) instead.
        F.explode(
            F.when(
                F.greatest(F.col("home") - d, F.lit(0))
                <= F.least(
                    F.col("home") + d, F.col("m") - F.col("seg_len")
                ),
                F.sequence(
                    F.greatest(F.col("home") - d, F.lit(0)),
                    F.least(
                        F.col("home") + d, F.col("m") - F.col("seg_len")
                    ),
                ),
            )
        ).alias("p"),
    ).select(
        "id_l",
        "s_l",
        "l_r",
        "seg_i",
        F.substring(F.col("s_l"), F.col("p") + 1, F.col("seg_len")).alias(
            "seg"
        ),
    )

    cand = (
        probes.join(segs, ["l_r", "seg_i", "seg"])
        .where(F.col("id_l") != F.col("id_r"))
        .select(
            F.least("id_l", "id_r").alias("id_l"),
            F.greatest("id_l", "id_r").alias("id_r"),
            F.when(F.col("id_l") < F.col("id_r"), F.col("s_l"))
            .otherwise(F.col("s_r"))
            .alias("s_l"),
            F.when(F.col("id_l") < F.col("id_r"), F.col("s_r"))
            .otherwise(F.col("s_l"))
            .alias("s_r"),
        )
        .distinct()
    )

    return (
        cand.withColumn("lev", F.levenshtein("s_l", "s_r").cast("long"))
        .where(F.col("lev") <= d)
        .select("id_l", "id_r", "lev")
    )
