"""Match Rating Approach (MRA) — Western Airlines' 1977 name codex +
similarity-rating comparison, the third classic phonetic family next
to Soundex and NYSIIS (Moore et al., NIST SP-500-2; the algorithm
every survey of name matching lists alongside Soundex/NYSIIS, e.g.
Christen 2006 "A Comparison of Personal Name Matching"). The
reference blocks on synonym-map + prefix keys only (blocking_B1.py /
blocking_B2.py); MRA is a standard linkage key family it lacks
(SURVEY §2.3), and unlike Soundex it ships its OWN matcher: a
length-gated positional-residue similarity rating with a
codex-length-dependent acceptance threshold.

Pinned convention (the published algorithm leaves two details loose;
both engines and the Python replica implement exactly this):

Codex (domain ``[A-Za-z]+``, same contract as ``soundex_sql``):
1. uppercase; keep the first letter verbatim;
2. delete vowels (AEIOU) from the tail — a LEADING vowel survives;
3. collapse runs of equal adjacent letters to one (the published
   "drop the second of any double consonant", extended to runs;
   vowel runs cannot reach this step, so the extension only pins the
   degenerate inputs);
4. if longer than 6, keep the first 3 + last 3 letters.

Comparison of two codices (lengths 1..6):
1. comparable iff abs(len_l - len_r) <= 2 (the published "length
   difference of 3 or more -> no comparison");
2. minimum acceptance rating from the length sum: <=4 -> 5,
   <=7 -> 4, <=11 -> 3, else 2;
3. forward pass: at each position i, a character of one codex is
   RESIDUE iff the other codex is shorter than i or differs at i
   (positional removal, left-to-right);
4. backward pass: the same positional removal applied to the two
   REVERSED forward residues (right-to-left removal);
5. similarity rating = 6 - max(len of the two final residues);
   match iff comparable AND rating >= minimum rating.

Worked example (the classic BYRNE/BOERN pair): codices BYRN / BRN,
forward residues YRN / RN, backward residues Y / '' -> rating 5,
length sum 7 -> minimum 4 -> match.

Engine shape: the codex is a 100% native column expression
(regexp_replace/translate-free — two regex passes + a length CASE;
whole-stage codegen, map-only) and the comparison is a fully UNROLLED
6-position CASE/concat chain (codices are <=6 by construction) — no
UDF, no lambda, so DuckDB replays the identical arithmetic for the
value-exact oracle. The one reachable-domain-equivalent divergence:
Spark collapses duplicate runs with a backreference regex
(``(.)\\1+``), DuckDB (RE2, no backreferences) with 21 per-consonant
passes — equal wherever step 2 has run, because post-vowel-removal
strings cannot contain vowel runs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "mra_codex",
    "mra_codex_sql",
    "mra_codex_py",
    "mra_rating",
    "mra_min_rating",
    "mra_comparable",
    "mra_rating_sql",
    "mra_min_rating_sql",
    "mra_comparable_sql",
    "mra_compare_py",
]

_VOWELS = "AEIOU"
_CONSONANTS = "BCDFGHJKLMNPQRSTVWXYZ"
# Codices are at most 6 characters by construction (step 4), so every
# positional loop below unrolls exactly this many slots.
_MAX_CODEX = 6


# ---------------------------------------------------------------- codex

def mra_codex(col: Column | str) -> Column:
    """Native Spark MRA codex of an ``[A-Za-z]+`` token."""
    s = F.upper(col)
    t = F.concat(
        F.substring(s, 1, 1),
        F.regexp_replace(F.substring(s, 2, 1_000_000), f"[{_VOWELS}]", ""),
    )
    c = F.regexp_replace(t, r"(.)\1+", "$1")
    return F.when(
        F.length(c) > _MAX_CODEX,
        F.concat(F.substring(c, 1, 3), F.substring(c, -3, 3)),
    ).otherwise(c)


def mra_codex_sql(expr: str) -> str:
    """DuckDB scalar expression: MRA codex of ``expr`` (an uppercase
    ``[A-Z]+`` string — wrap with ``upper(...)`` at the call site).
    RE2-safe: run collapse is one pass per consonant."""
    t = (
        f"substr({expr}, 1, 1) || "
        f"regexp_replace(substr({expr}, 2), '[{_VOWELS}]', '', 'g')"
    )
    c = t
    for ch in _CONSONANTS:
        c = f"regexp_replace({c}, '{ch}{ch}+', '{ch}', 'g')"
    return (
        f"CASE WHEN length({c}) > {_MAX_CODEX} "
        f"THEN substr({c}, 1, 3) || substr({c}, length({c}) - 2, 3) "
        f"ELSE {c} END"
    )


def mra_codex_py(s: str) -> str:
    """Pure-Python replica (test triangulation only)."""
    import re

    s = s.upper()
    if not s:
        return s
    t = s[0] + re.sub(f"[{_VOWELS}]", "", s[1:])
    out: list[str] = []
    for ch in t:
        if not out or out[-1] != ch:
            out.append(ch)
    c = "".join(out)
    return c if len(c) <= _MAX_CODEX else c[:3] + c[-3:]


# ----------------------------------------------------------- comparison

def _fwd_residue(a: Column, b: Column) -> Column:
    """Positional residue of codex ``a`` vs codex ``b``: the a-chars
    at positions where b is shorter or differs (unrolled 6 slots)."""
    parts = []
    for i in range(1, _MAX_CODEX + 1):
        ai = F.substring(a, i, 1)
        bi = F.substring(b, i, 1)
        keep = (F.length(a) >= i) & ((F.length(b) < i) | (ai != bi))
        parts.append(F.when(keep, ai).otherwise(F.lit("")))
    return F.concat(*parts)


def mra_rating(cl: Column | str, cr: Column | str) -> Column:
    """Similarity rating (0..6) of two MRA codices — forward then
    backward positional-residue removal, 6 minus the longer final
    residue. Pure column expression."""
    cl, cr = F.col(cl) if isinstance(cl, str) else cl, (
        F.col(cr) if isinstance(cr, str) else cr
    )
    fa, fb = _fwd_residue(cl, cr), _fwd_residue(cr, cl)
    ba = _fwd_residue(F.reverse(fa), F.reverse(fb))
    bb = _fwd_residue(F.reverse(fb), F.reverse(fa))
    return (F.lit(_MAX_CODEX) - F.greatest(F.length(ba), F.length(bb))).cast(
        "int"
    )


def mra_min_rating(cl: Column | str, cr: Column | str) -> Column:
    """Minimum acceptance rating from the codex length sum."""
    lensum = F.length(cl) + F.length(cr)
    return (
        F.when(lensum <= 4, 5)
        .when(lensum <= 7, 4)
        .when(lensum <= 11, 3)
        .otherwise(2)
        .cast("int")
    )


def mra_comparable(cl: Column | str, cr: Column | str) -> Column:
    """False when the codex lengths differ by 3+ (no comparison)."""
    return F.abs(F.length(cl) - F.length(cr)) <= 2


def _fwd_residue_sql(a: str, b: str) -> str:
    terms = []
    for i in range(1, _MAX_CODEX + 1):
        terms.append(
            f"CASE WHEN length({a}) >= {i} AND (length({b}) < {i} "
            f"OR substr({a}, {i}, 1) <> substr({b}, {i}, 1)) "
            f"THEN substr({a}, {i}, 1) ELSE '' END"
        )
    return "(" + " || ".join(terms) + ")"


def mra_rating_sql(cl: str, cr: str, fa: str = "__mra_fa",
                   fb: str = "__mra_fb") -> tuple[str, str, str]:
    """DuckDB replica of :func:`mra_rating`, split for CTE staging:
    returns (fa_expr, fb_expr, rating_expr_over_fa_fb) where the
    rating expression references the forward residues by the column
    NAMES ``fa``/``fb`` — materialize them in an intermediate CTE so
    the backward pass does not inline the forward expressions twice."""
    fa_expr = _fwd_residue_sql(cl, cr)
    fb_expr = _fwd_residue_sql(cr, cl)
    ba = _fwd_residue_sql(f"reverse({fa})", f"reverse({fb})")
    bb = _fwd_residue_sql(f"reverse({fb})", f"reverse({fa})")
    rating = (
        f"CAST({_MAX_CODEX} - greatest(length({ba}), length({bb})) "
        f"AS INTEGER)"
    )
    return fa_expr, fb_expr, rating


def mra_min_rating_sql(cl: str, cr: str) -> str:
    return (
        f"CAST(CASE WHEN length({cl}) + length({cr}) <= 4 THEN 5 "
        f"WHEN length({cl}) + length({cr}) <= 7 THEN 4 "
        f"WHEN length({cl}) + length({cr}) <= 11 THEN 3 "
        f"ELSE 2 END AS INTEGER)"
    )


def mra_comparable_sql(cl: str, cr: str) -> str:
    return f"(abs(length({cl}) - length({cr})) <= 2)"


def _fwd_residue_py(a: str, b: str) -> str:
    return "".join(
        a[i] for i in range(len(a)) if i >= len(b) or a[i] != b[i]
    )


def mra_compare_py(c1: str, c2: str) -> tuple[int, bool, bool]:
    """Pure-Python replica: (rating, comparable, is_match)."""
    fa, fb = _fwd_residue_py(c1, c2), _fwd_residue_py(c2, c1)
    ba = _fwd_residue_py(fa[::-1], fb[::-1])
    bb = _fwd_residue_py(fb[::-1], fa[::-1])
    rating = _MAX_CODEX - max(len(ba), len(bb))
    lensum = len(c1) + len(c2)
    minr = 5 if lensum <= 4 else 4 if lensum <= 7 else 3 if lensum <= 11 else 2
    comparable = abs(len(c1) - len(c2)) <= 2
    return rating, comparable, comparable and rating >= minr
