"""Bag distance — the cheap multiset lower bound on edit distance
(beyond reference — SURVEY §2.12 comparator family).

Bartolini-Ciaccia-Patella (SPIRE'02): treat each string as a MULTISET
of characters and measure
``bag(a, b) = max(|bag(a) − bag(b)|, |bag(b) − bag(a)|)`` where ``−``
is multiset difference. The point of the operator is the proven bound
``bag(a, b) ≤ levenshtein(a, b)`` (each edit changes the multiset by
at most one element per side): at web scale, the O(L) bag distance
runs as a pure native expression INSIDE whole-stage codegen, so a
``bag > threshold`` predicate prunes candidate pairs before the
O(L1·L2) Arrow DP kernels (functions/damerau.py,
functions/needleman.py) ever see them — the classic filter-and-verify
shape, same discipline as the length filter in
operators/setsim_join.py.

Everything is integer arithmetic over higher-order array functions
(split → filter → aggregate) — zero Python, zero floats, value-exact
against a DuckDB oracle that replicates the multiset algebra with
list_transform/list_filter/list_sum. NULL is treated as the empty
string (totality; callers that want NULL propagation guard upstream).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _chars(c: Column) -> Column:
    """Array of single characters; split('', pattern='') emits no
    empty trailing element in Spark 3.4+, but filter defensively so
    the expression is robust across versions."""
    return F.filter(F.split(F.coalesce(c, F.lit("")), ""), lambda x: x != "")


def _one_sided(chars_l: Column, chars_r: Column, domain: Column) -> Column:
    """Σ_c max(count_l(c) − count_r(c), 0) over the char domain —
    the size of the multiset difference bag(l) − bag(r)."""
    return F.aggregate(
        domain,
        F.lit(0),
        lambda acc, ch: acc
        + F.greatest(
            F.size(F.filter(chars_l, lambda x: x == ch))
            - F.size(F.filter(chars_r, lambda x: x == ch)),
            F.lit(0),
        ),
    )


def bag_distance(l: Column | str, r: Column | str) -> Column:  # noqa: E741
    """max(|bag(l)−bag(r)|, |bag(r)−bag(l)|) as a BIGINT column;
    NULL-as-empty, so bag(NULL, s) = len(s)."""
    lc = F.col(l) if isinstance(l, str) else l
    rc = F.col(r) if isinstance(r, str) else r
    ca, cb = _chars(lc), _chars(rc)
    domain = F.array_distinct(F.concat(ca, cb))
    return F.greatest(
        _one_sided(ca, cb, domain), _one_sided(cb, ca, domain)
    ).cast("long")


def bag_distance_fixed_alphabet(
    l: Column | str,  # noqa: E741
    r: Column | str,
    alphabet: str,
) -> Column:
    """Exact bag distance for strings over a KNOWN finite alphabet,
    with zero higher-order functions.

    Identity: with I = Σ_c min(count_l(c), count_r(c)) the multiset
    intersection size, one_sided(a,b) = |a| − I, so
    ``bag = max(|a| − I, |b| − I) = max(|a|, |b|) − I``. Each per-char
    count is the native ``length(s) − length(replace(s, c))``
    difference, so the whole expression stays in whole-stage codegen —
    the generic :func:`bag_distance` evaluates its multiset algebra
    through INTERPRETED higher-order lambdas that re-split both
    strings once per domain character (~100 splits per pair; measured
    ~2.5 s of the contract query's wall at sf0.1).

    Correct ONLY when every character of both inputs lies in
    ``alphabet`` (a foreign char shared by both sides would be missing
    from I and inflate the distance) — callers pass a sanitized basis,
    e.g. the contract query's ``[a-z0-9 ]`` regex slice. Equality with
    the generic form on in-alphabet strings is pytest-pinned.
    NULL-as-empty, like :func:`bag_distance`."""
    lc = F.coalesce(F.col(l) if isinstance(l, str) else l, F.lit(""))
    rc = F.coalesce(F.col(r) if isinstance(r, str) else r, F.lit(""))

    def _cnt(c: Column, ch: str) -> Column:
        return F.length(c) - F.length(F.replace(c, F.lit(ch), F.lit("")))

    inter = sum(
        (F.least(_cnt(lc, ch), _cnt(rc, ch)) for ch in alphabet),
        F.lit(0),
    )
    return (
        F.greatest(F.length(lc), F.length(rc)) - inter
    ).cast("long")


def sim_bag(l: Column | str, r: Column | str) -> Column:  # noqa: E741
    """Normalized bag similarity 1 − bag/max(len); both-empty → 1.0.
    Because bag ≤ levenshtein, sim_bag ≥ sim_levenshtein — an
    optimistic screen: anything sim_bag rejects, the edit-distance
    comparators would reject too."""
    lc = F.col(l) if isinstance(l, str) else l
    rc = F.col(r) if isinstance(r, str) else r
    denom = F.greatest(F.length(lc), F.length(rc), F.lit(1))
    return F.lit(1.0) - bag_distance(lc, rc) / denom
