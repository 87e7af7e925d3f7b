"""Longest-common-substring comparator (beyond reference — SURVEY
§2.12 comparator family; Friedman & Sideli 1992, Christen "Data
Matching" ch. 5.9).

``lcs_len(a, b)`` is the length of the longest CONTIGUOUS substring
the two strings share — the signal the edit-family comparators dilute:
a wholesale token move ("john smith" vs "smith john") costs
Levenshtein almost everything but keeps a long common substring, and
conversely a string of scattered single-char typos can keep edit
distance low while no long run survives. Christen ch. 5.9 pairs it
with the alignment kernels for exactly that reason: it grades
BLOCK-level agreement where Jaro/Levenshtein grade character-level
agreement.

Shape: every common substring of ``a`` and ``b`` is a window of the
SHORTER input, so the expression enumerates the shorter side's
windows (all lengths 1..L, all offsets) and probes each into the
longer side with ``contains`` — max matching window length wins.
That is O(L^2) windows x O(L) probe per pair, all INSIDE whole-stage
codegen as nested higher-order functions (sequence / transform /
exists) — zero Python, zero floats until the final normalized
similarity, value-exact against a DuckDB oracle that replicates the
same window generation with generate_series/list_transform/
list_filter. The O(L^3) per-pair cost is the deliberate trade for
full codegen residency: callers slice keys to a bounded length BEFORE
calling (same discipline as the Arrow DP kernels in
functions/needleman.py and the q-gram passes — contract queries use
40-char slices), so the constant is ~64k char-compares per pair.

NULL is treated as the empty string (totality; callers that want NULL
propagation guard upstream) — lcs_len(NULL, s) = 0, matching the
bag/q-gram convention.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def lcs_len(l: Column | str, r: Column | str) -> Column:  # noqa: E741
    """Length of the longest common contiguous substring as BIGINT;
    NULL-as-empty, so lcs_len(NULL, s) = 0 and lcs_len(s, s) =
    len(s). Windows are enumerated from the shorter input (tie: the
    left one) — the result is side-symmetric by construction, since a
    common substring is a substring of BOTH inputs."""
    lc = F.coalesce(_as_col(l), F.lit(""))
    rc = F.coalesce(_as_col(r), F.lit(""))
    left_shorter = F.length(lc) <= F.length(rc)
    s = F.when(left_shorter, lc).otherwise(rc)
    t = F.when(left_shorter, rc).otherwise(lc)
    n_win = F.length(s)
    # For each window length n in 1..len(s): n if ANY offset i yields
    # a window contained in t, else 0; the max over lengths is the
    # LCS length. sequence(1, 0) in Spark counts DOWN ([1, 0]), so
    # the n_win = 0 case is guarded outside rather than relying on an
    # empty sequence (DuckDB's generate_series(1, 0) IS empty — the
    # guard keeps the two engines' bases identical by construction).
    per_len = F.transform(
        F.sequence(F.lit(1), n_win),
        lambda n: F.when(
            F.exists(
                F.sequence(F.lit(1), n_win - n + F.lit(1)),
                lambda i: F.contains(t, s.substr(i, n)),
            ),
            n,
        ).otherwise(F.lit(0)),
    )
    return (
        F.when(n_win >= 1, F.array_max(per_len)).otherwise(F.lit(0))
    ).cast("long")


def sim_lcs(l: Column | str, r: Column | str) -> Column:  # noqa: E741
    """Normalized LCS similarity lcs_len / max(len_l, len_r, 1) —
    the conservative (max-divisor) normalization of Christen ch. 5.9;
    both-empty → 0.0 under the max(…, 1) guard, equal non-empty
    strings → 1.0."""
    lc = F.coalesce(_as_col(l), F.lit(""))
    rc = F.coalesce(_as_col(r), F.lit(""))
    denom = F.greatest(F.length(lc), F.length(rc), F.lit(1))
    return lcs_len(lc, rc) / denom.cast("double")
