"""Text-analysis functions for large-scale training-data pipelines:
token counting, quality scoring, language-ID heuristic, document
fingerprinting. All native column expressions (JVM-side, codegen).

These extend the reference's text handling (clean_text + per-field
normalizers) to the document-corpus operations a web-scale pipeline
needs; each has a DuckDB-oracle-checkable entry in __spark_entry__.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword seed sets for the n-gram/stopword-voting
# heuristic (public-knowledge lists, truncated for determinism).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "a"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "von"),
    "it": ("il", "la", "di", "che", "e", "un", "per", "non", "sono", "con"),
    "es": ("el", "la", "de", "que", "y", "un", "por", "no", "es", "con"),
    "fr": ("le", "la", "de", "et", "un", "que", "pour", "pas", "est", "avec"),
}

PUNCT_CHARS = ".,!?-"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens_expr(col: Column | str) -> Column:
    """Whitespace tokens of trimmed text; empty text → empty array.

    Uses Java `\\s`, whose set is U+0009–U+000D + space; RE2 (DuckDB)
    excludes U+000B, so oracle parity for the queries built on this
    tokenizer is scoped to VT-free text (true of the corpus; the BPE
    pre-tokenizer below spells the class explicitly instead because
    its token-for-token parity claim is unconditional)."""
    t = F.trim(_c(col))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count_expr(col: Column | str) -> Column:
    """Whitespace token count (BPE-ish approximations layer on top)."""
    return F.size(tokens_expr(col))


# GPT-2-style pre-tokenizer pattern, made lookahead-free (RE2 has no
# lookaround) so the SAME pattern runs token-for-token identically on
# Java regex (Spark) and RE2 (DuckDB) — verified across contractions,
# unicode letters/digits, punctuation runs and mixed whitespace. The
# trailing-space grouping of the original (`\s+(?!\S)`) collapses into
# plain whitespace runs; everything else matches the published
# tokenizer's pre-split behavior. Whitespace is the EXPLICIT class
# `[\t-\r ]` (0x09–0x0D + space) rather than `\s`: Java's `\s`
# includes U+000B (vertical tab) while RE2's does not, so `\s` breaks
# token-for-token parity on VT-bearing text ('\x0B ' would be 1 token
# in Spark, 2 in DuckDB). `[\t-\r ]` is Java's exact `\s` set, spelled
# so both engines agree.
BPE_PRETOKEN_RE = (
    r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+"
    r"| ?[^\t-\r \p{L}\p{N}]+|[\t-\r ]+"
)


def bpe_token_count_expr(col: Column | str) -> Column:
    """BPE-ish token count: matches of the GPT-2-style pre-tokenizer
    regex (letters / numbers / punctuation runs / whitespace, with
    English contractions split) — the cheap LLM-token estimate a
    training-data pipeline budgets with. NULL text counts 0."""
    c = _c(col)
    return F.when(c.isNull(), F.lit(0)).otherwise(
        F.size(F.regexp_extract_all(c, F.lit(BPE_PRETOKEN_RE), F.lit(0)))
    )


def punct_ratio_expr(col: Column | str) -> Column:
    """Fraction of characters that are sentence punctuation."""
    c = _c(col)
    kept = F.length(c) - F.length(F.translate(c, PUNCT_CHARS, ""))
    return F.when(F.length(c) > 0, kept / F.length(c)).otherwise(F.lit(0.0))


def stopword_ratio_expr(col: Column | str, lang: str = "en") -> Column:
    """Fraction of tokens that are (lang) stopwords."""
    toks = tokens_expr(col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def quality_score_expr(col: Column | str) -> Column:
    """Heuristic document-quality score in [0,1]: length band +
    moderate punctuation + mean word length band (the classic cheap
    web-text quality signals)."""
    c = _c(col)
    n = F.length(c).cast("double")
    toks = tokens_expr(col)
    ntok = F.size(toks).cast("double")
    mean_wl = F.when(ntok > 0, (n - (ntok - 1)) / ntok).otherwise(F.lit(0.0))
    len_ok = F.when((n >= 100) & (n <= 20000), F.lit(1.0)).otherwise(
        F.when(n > 0, F.lit(0.5)).otherwise(F.lit(0.0))
    )
    punct = punct_ratio_expr(col)
    punct_ok = F.when(punct <= 0.1, F.lit(1.0)).otherwise(F.lit(0.5))
    wl_ok = F.when((mean_wl >= 3.0) & (mean_wl <= 12.0), F.lit(1.0)).otherwise(
        F.lit(0.5)
    )
    return (len_ok + punct_ok + wl_ok) / F.lit(3.0)


def lang_scores_expr(col: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit counts over the distinct token set."""
    toks = F.array_distinct(F.transform(tokens_expr(col), F.lower))
    return {
        lang: F.size(
            F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))
        )
        for lang, words in STOPWORDS.items()
    }


def lang_id_expr(col: Column | str, min_hits: int = 1) -> Column:
    """Argmax language by stopword votes; 'und' when no hits. Ties
    break by fixed language order (en, de, it, es, fr)."""
    scores = lang_scores_expr(col)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(list(STOPWORDS)):
        expr = F.when(
            (scores[lang] >= min_hits) & (scores[lang] == best), F.lit(lang)
        ).otherwise(expr)
    return expr


def sliding_concat(toks: Column, n: int) -> Column:
    """Space-joined sliding n-grams of a (non-null-element) token
    array, built from ``zip_with`` over shifted slices.

    The obvious formulation — ``transform(sequence(1, len-n+1),
    i -> concat(element_at(toks, i), ...))`` — is a performance trap:
    higher-order functions evaluate INTERPRETED (no codegen), and a
    lambda body that references the token-array EXPRESSION (rather
    than a lambda variable) re-evaluates that whole expression per
    element — for ``toks`` built by regex/split over the full text,
    that is O(tokens) full-text splits per row (measured: the minhash
    shingle pass and the repetition signal were ~6 s/5k docs at
    sf0.1, all re-split time). ``zip_with`` lambdas see only element
    variables, so the array expressions evaluate once per ROW.

    Shorter-than-n inputs yield an empty array. Trailing zip_with
    null-padding is cut by the final slice, so no null grams leak
    (concat over a null pad would null the gram anyway — sliced off)."""
    g = toks
    for j in range(1, n):
        g = F.zip_with(
            g,
            F.slice(toks, j + 1, F.greatest(F.size(toks) - j, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.slice(
        g, 1, F.greatest(F.size(toks) - (n - 1), F.lit(0))
    )


def word_ngrams_expr(col: Column | str, n: int = 3) -> Column:
    """Lowercased word n-grams (space-joined) of the text. Whitespace
    is the explicit class ``[\\t-\\r ]`` (not ``\\s``) so Java regex
    and RE2 tokenize identically — see BPE_PRETOKEN_RE. Fewer than
    ``n`` tokens (or NULL text) → empty array."""
    toks = F.filter(
        F.split(F.lower(_c(col)), r"[\t-\r ]+"),
        lambda t: F.length(t) > 0,
    )
    grams = sliding_concat(toks, n)
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def repetition_ratio_expr(col: Column | str, n: int = 3) -> Column:
    """Duplicate word-n-gram share in [0,1): 1 − distinct/total over
    the document's n-grams — the classic intra-document repetition
    quality signal (boilerplate, listicles and generator loops score
    high). Map-only native exprs, no shuffle; < n tokens → 0.0."""
    grams = word_ngrams_expr(col, n)
    total = F.size(grams)
    return F.when(
        total > 0, F.lit(1.0) - F.size(F.array_distinct(grams)) / total
    ).otherwise(F.lit(0.0))


def reject_reason_expr(
    col: Column | str,
    min_chars: int = 50,
    max_chars: int = 20000,
    max_punct: float = 0.10,
    min_stopword: float = 0.01,
    max_repetition: float = 0.20,
    lang: str = "en",
) -> Column:
    """Composed Gopher/C4-style corpus filter: FIRST failing rule's
    name, or NULL when the document is kept. Fixed rule order (cheap
    to expensive): too_short, too_long, high_punct, low_stopword,
    high_repetition. Each signal is the exact expression its
    standalone operator uses, so the composed filter inherits their
    engine-parity guarantees. Map-only; NULL text → too_short."""
    n = F.coalesce(F.length(_c(col)), F.lit(0))
    return (
        F.when(n < min_chars, F.lit("too_short"))
        .when(n > max_chars, F.lit("too_long"))
        .when(punct_ratio_expr(col) > max_punct, F.lit("high_punct"))
        .when(
            stopword_ratio_expr(col, lang) < min_stopword,
            F.lit("low_stopword"),
        )
        .when(
            repetition_ratio_expr(col) > max_repetition,
            F.lit("high_repetition"),
        )
        .otherwise(F.lit(None).cast("string"))
    )


def fingerprint_expr(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 over the normalized
    token stream (whitespace-insensitive, case-insensitive)."""
    norm = F.concat_ws(" ", F.transform(tokens_expr(col), F.lower))
    return F.md5(norm)
