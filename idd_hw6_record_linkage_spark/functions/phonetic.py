"""Phonetic blocking keys — Soundex, the classic record-linkage key.

Phonetic keys are a standard blocking family the reference does not
ship (its B1/B2 keys are synonym-map + prefix based; SURVEY §2.3) but
every production linkage toolkit carries: names that sound alike land
in the same block even when they are spelled differently
(ROBERT/RUPERT -> R163). Spark has a native JVM implementation
(``F.soundex``, whole-stage-codegen friendly), so the engine-side key
is a single catalyst expression — the work in this module is the
ORACLE: DuckDB has no soundex, so :func:`soundex_sql` replicates
Spark's exact algorithm in portable SQL for the value-exact contract
gate, and :func:`soundex_py` is the pure-Python replica the fuzz test
triangulates with.

Spark's algorithm (probed empirically this session on 30 edge cases,
matching Apache-Commons ``Soundex`` with the H/W rule):

1. uppercase; if the first character is not A-Z the input is returned
   unchanged (``1ABC`` -> ``1ABC``, ``''`` -> ``''``);
2. H and W are removed entirely and do NOT break code adjacency
   (ASHCRAFT -> A261, not A226) — except a LEADING H/W, which is kept
   as the output letter (HALL -> H400);
3. remaining letters map to codes
   (BFPV=1 CGJKQSXZ=2 DT=3 L=4 MN=5 R=6, vowels+Y=0), adjacent equal
   codes collapse (PFISTER -> P236: the F collapses into the P);
4. the first code is replaced by the first letter, zeros (vowel
   separators) are dropped, and the result is right-padded with zeros
   to exactly 4 characters.

The SQL replica constrains its domain to ``^[A-Za-z]+$`` inputs —
the contract queries extract alphabetic tokens before keying, which
is also the realistic linkage usage (soundex over a CLEANED name
part). Inside that domain it is byte-identical to Spark; outside it
(digits, punctuation, empty) Spark has idiosyncratic pass-through
behavior the replica deliberately does not chase.

RE2 note: DuckDB's regexp engine has no backreferences, so the
adjacent-duplicate collapse cannot be ``(.)\\1+`` — it is seven
per-digit ``'DD+' -> 'D'`` passes instead (codes only span 0-6).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "soundex_key",
    "soundex_sql",
    "soundex_py",
    "SOUNDEX_CODES",
    "refined_soundex_key",
    "refined_soundex_sql",
    "refined_soundex_py",
    "REFINED_SOUNDEX_CODES",
]

# A..Z -> soundex digit ('0' = vowel/Y separator; H/W are REMOVED
# before this map applies, their entries exist only for a leading H/W
# whose code never survives into the output digits).
SOUNDEX_CODES = "01230120022455012623010202"


def soundex_key(col: Column | str) -> Column:
    """Native Spark soundex over an uppercased input.

    Uppercasing first keeps the expression inside the documented
    alpha domain whenever the caller extracts alphabetic tokens, and
    costs nothing (Spark uppercases internally anyway — this just
    makes the contract explicit).
    """
    return F.soundex(F.upper(col))


def soundex_sql(expr: str) -> str:
    """DuckDB SQL expression: Spark-exact soundex of ``expr``.

    ``expr`` must evaluate to an uppercase ``[A-Z]+`` string (the
    caller is expected to wrap with ``upper(...)`` and restrict to
    alphabetic tokens). Returns a single scalar SQL expression —
    nestable inside any SELECT.
    """
    # 1. leading char kept verbatim; H/W removed from the tail only.
    t = (
        f"substr({expr}, 1, 1) || "
        f"replace(replace(substr({expr}, 2), 'H', ''), 'W', '')"
    )
    # 2. every letter -> its code digit (leading letter included: its
    #    code participates in the adjacency collapse, e.g. PFISTER).
    c = (
        f"translate({t}, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', "
        f"'{SOUNDEX_CODES}')"
    )
    # 3. collapse runs of equal codes — one RE2-safe pass per digit.
    for d in "0123456":
        c = f"regexp_replace({c}, '{d}{d}+', '{d}', 'g')"
    # 4. first letter + non-zero tail codes, padded to 4.
    return (
        f"substr(substr({expr}, 1, 1) || "
        f"replace(substr({c}, 2), '0', '') || '000', 1, 4)"
    )


def soundex_py(s: str) -> str:
    """Pure-Python replica (test triangulation only — never the hot
    path). Same ``[A-Za-z]+`` domain as :func:`soundex_sql`."""
    s = s.upper()
    if not s or not ("A" <= s[0] <= "Z"):
        return s
    t = s[0] + s[1:].replace("H", "").replace("W", "")
    codes = [SOUNDEX_CODES[ord(ch) - ord("A")] for ch in t]
    collapsed: list[str] = []
    for code in codes:
        if not collapsed or collapsed[-1] != code:
            collapsed.append(code)
    digits = [d for d in collapsed[1:] if d != "0"]
    return (s[0] + "".join(digits) + "000")[:4]


# A..Z -> refined-soundex digit (Apache-Commons RefinedSoundex map:
# BP=1 FV=2 CKS=3 GJ=4 QXZ=5 DT=6 L=7 MN=8 R=9, vowels+HWY=0).
REFINED_SOUNDEX_CODES = "01360240043788015936020505"


def refined_soundex_key(col: Column | str) -> Column:
    """Refined Soundex (Apache-Commons ``RefinedSoundex`` behavior):
    first letter + the run-collapsed digit string of EVERY letter
    (leading letter's own code included, vowel zeros KEPT as
    separators, no truncation) — e.g. TESTING -> T6036084. A finer
    phonetic key than classic Soundex: keeping the zero separators and
    the full length splits the mega-blocks Soundex's 4-char truncation
    creates, which is the variant's point for blocking (smaller, more
    selective blocks at corpus scale).

    100% native expression (translate + per-digit run-collapse chain —
    digits only span 0-9 so RE2's no-backreference limit costs ten
    fixed passes, same trick as :func:`soundex_sql`). Domain: callers
    pass uppercase alphabetic tokens; non-alpha chars are stripped
    first so the key is total. Empty/NULL -> ''.
    """
    s = F.regexp_replace(
        F.upper(col if isinstance(col, Column) else F.col(col)),
        "[^A-Z]",
        "",
    )
    c: Column = F.translate(
        s,
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ",
        REFINED_SOUNDEX_CODES,
    )
    for d in "0123456789":
        c = F.regexp_replace(c, f"{d}{d}+", d)
    return F.coalesce(
        F.concat(F.substring(s, 1, 1), c), F.lit("")
    )


def refined_soundex_sql(expr: str) -> str:
    """DuckDB SQL expression: Spark-exact refined soundex of ``expr``
    (any string; non-alpha stripped after uppercasing, same as
    :func:`refined_soundex_key`)."""
    s = f"regexp_replace(upper({expr}), '[^A-Z]', '', 'g')"
    c = (
        f"translate({s}, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', "
        f"'{REFINED_SOUNDEX_CODES}')"
    )
    for d in "0123456789":
        c = f"regexp_replace({c}, '{d}{d}+', '{d}', 'g')"
    return f"coalesce(substr({s}, 1, 1) || {c}, '')"


def refined_soundex_py(s: str) -> str:
    """Pure-Python replica (test triangulation only)."""
    import re

    s = re.sub("[^A-Z]", "", (s or "").upper())
    if not s:
        return ""
    codes = [REFINED_SOUNDEX_CODES[ord(ch) - ord("A")] for ch in s]
    collapsed: list[str] = []
    for code in codes:
        if not collapsed or collapsed[-1] != code:
            collapsed.append(code)
    return s[0] + "".join(collapsed)


# ---------------------------------------------------------------- NYSIIS

# NYSIIS (Taft 1970, the New York State Identification and
# Intelligence System key) — the other classic phonetic blocking key
# every linkage toolkit carries next to Soundex. Published
# implementations disagree on edge cases (Apache Commons, dropo's
# reference C, and the textbook pseudo-code all differ on H/W
# handling, final-S runs and vowel-run collapse), so this engine pins
# ITS OWN variant as an order-fixed chain of regex/translate passes
# and enforces it three ways: the Spark Column expression, the DuckDB
# SQL replica (the value-exact oracle basis), and the pure-Python
# replica the fuzz test triangulates with, all generated from the
# SAME pass tables below. Known divergence from the iterative
# textbook algorithm: vowel runs collapse across DISTINCT original
# vowels ("EAB" -> "EB", textbook "EAB") — same single-separator
# treatment Soundex applies, and harmless for blocking (it only makes
# blocks coarser, never splits a textbook block across keys).
#
# Pass tables use RE2-safe patterns (no back-references in PATTERNS —
# only in replacements, which Spark spells $1 and DuckDB/Python \1).

# Head transcodes (anchored, applied in order to the cleaned name).
_NYSIIS_HEAD: list[tuple[str, str]] = [
    ("^MAC", "MCC"),
    ("^KN", "NN"),
    ("^K", "C"),
    ("^(PH|PF)", "FF"),
    ("^SCH", "SSS"),
]

# Tail transcodes (anchored at end).
_NYSIIS_TAIL: list[tuple[str, str]] = [
    ("(EE|IE)$", "Y"),
    ("(DT|RT|RD|NT|ND)$", "D"),
]

# Body passes BEFORE the vowel fold (EV must see original vowels;
# anchored to position >= 2 via the captured preceding char — the
# textbook scan never rewrites the first letter).
_NYSIIS_PRE: list[tuple[str, str]] = [(r"(.)EV", r"\1AF")]

# Body passes AFTER the vowel fold and QZM/K translates. The H rule
# ("H flanked by a non-vowel becomes the previous letter") is two
# ordered passes; the W rule ("W after a vowel becomes that vowel")
# is AW->AA since every vowel is already A.
_NYSIIS_POST: list[tuple[str, str]] = [
    ("SCH", "SSS"),
    ("PH", "FF"),
    (r"(.)H([^A])", r"\1\1\2"),
    (r"([^A])H", r"\1\1"),
    ("AW", "AA"),
]

# Terminal strips on the re-pinned key (classic order: S, AY, A).
_NYSIIS_FINAL: list[tuple[str, str]] = [
    ("S$", ""),
    ("AY$", "Y"),
    ("A$", ""),
]

_ALPHA = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"


def _java_repl(r: str) -> str:
    """RE2/Python ``\\1`` replacement syntax -> Java ``$1``."""
    return r.replace("\\", "$")


def nysiis_key(col: Column | str, max_len: int = 6) -> Column:
    """NYSIIS phonetic key as a 100% native Spark expression chain
    (regexp_replace/translate only — whole-stage codegen, map-only).
    Non-alpha stripped after uppercasing so the key is total;
    NULL -> NULL, '' -> ''. ``max_len`` truncates like the classic
    key (6); pass 0 to disable truncation for a finer blocking key
    (the refined-soundex trade)."""
    s = F.regexp_replace(
        F.upper(col if isinstance(col, Column) else F.col(col)),
        "[^A-Z]",
        "",
    )
    t = s
    for p, r in _NYSIIS_HEAD + _NYSIIS_TAIL:
        t = F.regexp_replace(t, p, _java_repl(r))
    first = F.substring(t, 1, 1)
    b = t
    for p, r in _NYSIIS_PRE:
        b = F.regexp_replace(b, p, _java_repl(r))
    b = F.translate(b, "AEIOU", "AAAAA")
    b = F.translate(b, "QZM", "GSN")
    b = F.regexp_replace(b, "KN", "N")
    b = F.translate(b, "K", "C")
    for p, r in _NYSIIS_POST:
        b = F.regexp_replace(b, p, _java_repl(r))
    for ch in _ALPHA:
        b = F.regexp_replace(b, f"{ch}{ch}+", ch)
    key = F.concat(first, F.substring(b, 2, 2**31 - 1))
    for p, r in _NYSIIS_FINAL:
        key = F.regexp_replace(key, p, r)
    key = F.when(key == "", first).otherwise(key)
    if max_len:
        key = F.substring(key, 1, max_len)
    return key


def nysiis_sql(expr: str, max_len: int = 6) -> str:
    """DuckDB SQL expression replicating :func:`nysiis_key` pass for
    pass (every regexp_replace carries the 'g' flag — DuckDB is
    first-match-only by default, Spark/Python are global)."""
    s = f"regexp_replace(upper({expr}), '[^A-Z]', '', 'g')"
    t = s
    for p, r in _NYSIIS_HEAD + _NYSIIS_TAIL:
        t = f"regexp_replace({t}, '{p}', '{r}', 'g')"
    first = f"substr({t}, 1, 1)"
    b = t
    for p, r in _NYSIIS_PRE:
        b = f"regexp_replace({b}, '{p}', '{r}', 'g')"
    b = f"translate({b}, 'AEIOU', 'AAAAA')"
    b = f"translate({b}, 'QZM', 'GSN')"
    b = f"regexp_replace({b}, 'KN', 'N', 'g')"
    b = f"translate({b}, 'K', 'C')"
    for p, r in _NYSIIS_POST:
        b = f"regexp_replace({b}, '{p}', '{r}', 'g')"
    for ch in _ALPHA:
        b = f"regexp_replace({b}, '{ch}{ch}+', '{ch}', 'g')"
    key = f"({first} || substr({b}, 2))"
    for p, r in _NYSIIS_FINAL:
        key = f"regexp_replace({key}, '{p}', '{r}', 'g')"
    key = f"coalesce(nullif({key}, ''), {first})"
    if max_len:
        key = f"substr({key}, 1, {max_len})"
    return key


def nysiis_py(name: str, max_len: int = 6) -> str:
    """Pure-Python replica (test triangulation only)."""
    import re

    s = re.sub("[^A-Z]", "", (name or "").upper())
    t = s
    for p, r in _NYSIIS_HEAD + _NYSIIS_TAIL:
        t = re.sub(p, r, t)
    first = t[:1]
    b = t
    for p, r in _NYSIIS_PRE:
        b = re.sub(p, r, b)
    b = b.translate(str.maketrans("AEIOU", "AAAAA"))
    b = b.translate(str.maketrans("QZM", "GSN"))
    b = b.replace("KN", "N").replace("K", "C")
    for p, r in _NYSIIS_POST:
        b = re.sub(p, r, b)
    for ch in _ALPHA:
        b = re.sub(f"{ch}{ch}+", ch, b)
    key = first + b[1:]
    for p, r in _NYSIIS_FINAL:
        key = re.sub(p, r, key)
    key = key or first
    return key[:max_len] if max_len else key


# --------------------------------------------------------------- Cologne
# Kölner Phonetik (Postel 1969) — the standard phonetic key for German
# names, and the fourth family next to Soundex/NYSIIS/MRA: codes are
# context-dependent (C hears its neighbors, X expands, D/T soften
# before sibilants), output length is unbounded (like Refined
# Soundex), and vowels collapse to a single 0 class. As with NYSIIS,
# published implementations disagree on edge cases, so the engine
# pins ITS OWN order-fixed pass-chain variant, generated for BOTH
# engines from the SAME table below, and proves it reproduces the
# canonical published vectors (MUELLER→657, BRESCHNEW→17863,
# WIKIPEDIA→3412, BACH→14, MATSCH→68). Pinned chain: ordered context
# passes (digits are inert to later passes), one letter→digit
# translate with H deleted, per-digit run collapse, then non-leading
# zero removal. Divergence class vs lookahead-based implementations:
# a context consumed by an earlier pass is invisible to later ones —
# the pass ORDER below resolves every such overlap deterministically
# (e.g. PH wins over P, D-before-sibilant wins over the C rules, the
# initial-C rule wins over the X-after-CKQ rule).
#
# Each row: (RE2-safe pattern, replacement template; {1}/{2} are the
# captured groups — positional format slots rendered as $1/$2 (Spark),
# \1/\2 (DuckDB RE2) or \g<1>/\g<2> (Python re) per engine).
COLOGNE_PASSES = [
    ("PH", "3"),
    ("([DT])([CSZ])", "8{2}"),
    ("^C([AHKLOQRUX])", "4{1}"),
    ("^C", "8"),
    ("([SZ])C", "{1}8"),
    ("C([AHKOQUX])", "4{1}"),
    ("C", "8"),
    ("([CKQ])X", "{1}8"),
    ("X", "48"),
]
_COLOGNE_FROM = "AEIJOUYBPDTFVWGKQLMNRSZH"
_COLOGNE_TO = "00000001122333444566788"  # H (last) deletes


def cologne_key(col: Column | str) -> Column:
    """Native Spark Kölner Phonetik over an uppercased input
    (``[A-Za-z]+`` domain, same contract as soundex_key). 100% native
    regexp_replace/translate chain — whole-stage codegen, map-only."""
    c = F.upper(col)
    for pat, repl in COLOGNE_PASSES:
        c = F.regexp_replace(c, pat, repl.format("", "$1", "$2"))
    c = F.translate(c, _COLOGNE_FROM, _COLOGNE_TO)
    for d in "012345678":
        c = F.regexp_replace(c, f"{d}{d}+", d)
    return F.concat(
        F.substring(c, 1, 1),
        F.regexp_replace(F.substring(c, 2, 1_000_000), "0", ""),
    )


def cologne_sql(expr: str) -> str:
    """DuckDB replica GENERATED from the same pass table — the two
    engines cannot drift. ``expr`` must be an uppercase ``[A-Z]+``
    scalar expression."""
    c = expr
    for pat, repl in COLOGNE_PASSES:
        r = repl.format("", r"\1", r"\2")
        c = f"regexp_replace({c}, '{pat}', '{r}', 'g')"
    c = f"translate({c}, '{_COLOGNE_FROM}', '{_COLOGNE_TO}')"
    for d in "012345678":
        c = f"regexp_replace({c}, '{d}{d}+', '{d}', 'g')"
    return (
        f"substr({c}, 1, 1) || "
        f"replace(substr({c}, 2), '0', '')"
    )


def cologne_py(s: str) -> str:
    """Pure-Python replica (test triangulation only)."""
    import re

    c = s.upper()
    for pat, repl in COLOGNE_PASSES:
        c = re.sub(pat, repl.format("", r"\g<1>", r"\g<2>"), c)
    table = {f: t for f, t in zip(_COLOGNE_FROM, _COLOGNE_TO)}
    table["H"] = ""
    c = "".join(table.get(ch, ch) for ch in c)
    out: list[str] = []
    for ch in c:
        if not out or out[-1] != ch:
            out.append(ch)
    c = "".join(out)
    return c[:1] + c[1:].replace("0", "")
