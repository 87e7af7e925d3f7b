"""mutual_best_match: symmetric rank-1 selection vs a naive
recomputation, 1:1 guarantee, deterministic ties, NULL scores."""

from __future__ import annotations

import pytest

from idd_hw6_record_linkage_spark.operators.resolution import (
    mutual_best_match,
)

PAIRS = [
    # (id_l, id_r, score) — l1 and r1 mutually best; l2's best r1 is
    # taken by l1 in r1's ranking, so l2 gets nothing; l3/r3 tie-broken.
    ("l1", "r1", 0.9),
    ("l1", "r2", 0.4),
    ("l2", "r1", 0.8),
    ("l2", "r2", 0.3),
    ("l3", "r3", 0.7),
    ("l3", "r4", 0.7),  # tie: smaller partner id r3 wins
    ("l4", "r4", 0.7),
    ("l5", "r5", None),  # only-candidate NULL pair is still mutual
    ("l6", "r6", 0.2),
    ("l6", "r7", None),  # NULL ranks below 0.2
]


def naive(pairs):
    best_l, best_r = {}, {}
    key = lambda p: (-(p[2] if p[2] is not None else float("-inf")),)
    for l, r, s in pairs:
        cand = sorted(
            [p for p in pairs if p[0] == l], key=lambda p: (key(p), p[1])
        )[0]
        best_l[l] = cand[1]
        cand = sorted(
            [p for p in pairs if p[1] == r], key=lambda p: (key(p), p[0])
        )[0]
        best_r[r] = cand[0]
    return {
        (l, r)
        for l, r, _ in pairs
        if best_l[l] == r and best_r[r] == l
    }


@pytest.fixture(scope="module")
def scored(spark):
    return spark.createDataFrame(
        PAIRS, "id_l string, id_r string, score double"
    )


def test_matches_naive_and_is_one_to_one(spark, scored):
    got = mutual_best_match(scored, "id_l", "id_r", "score")
    rows = got.collect()
    got_pairs = {(r["id_l"], r["id_r"]) for r in rows}
    assert got_pairs == naive(PAIRS)
    # explicit expectations, so the naive helper is itself checked
    assert ("l1", "r1") in got_pairs
    assert not any(l == "l2" for l, _ in got_pairs)
    assert ("l3", "r3") in got_pairs          # deterministic tie-break
    # r4's rank-1 is l3 (tie -> smaller partner id), and l3 pairs with
    # r3 — so l4 stays unmatched this round: mutual-best is ONE round
    # of greedy, not the full sequential matching (documented).
    assert not any(l == "l4" for l, _ in got_pairs)
    assert ("l5", "r5") in got_pairs          # mutual NULL-only pair
    assert ("l6", "r6") in got_pairs          # NULL ranks below a score
    lefts = [r["id_l"] for r in rows]
    rights = [r["id_r"] for r in rows]
    assert len(lefts) == len(set(lefts)) and len(rights) == len(set(rights))


def test_schema_passthrough(spark, scored):
    extra = scored.withColumn("note", scored.id_l)
    out = mutual_best_match(extra, "id_l", "id_r", "score")
    assert out.columns == ["id_l", "id_r", "score", "note"]


def test_empty_input(spark, scored):
    out = mutual_best_match(
        scored.where("score > 100"), "id_l", "id_r", "score"
    )
    assert out.count() == 0
