"""Match Rating Approach (functions.mra): three-way parity between
the native Spark expressions, the DuckDB SQL replicas, and the pure
Python replica on pinned textbook pairs plus a seeded fuzz sweep over
the documented [A-Za-z]+ domain, and the contract query's shape /
blockwise semantics."""

from __future__ import annotations

import random
import string

import duckdb
from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.functions.mra import (
    mra_codex,
    mra_codex_py,
    mra_codex_sql,
    mra_comparable,
    mra_comparable_sql,
    mra_compare_py,
    mra_min_rating,
    mra_min_rating_sql,
    mra_rating,
    mra_rating_sql,
)

# Pinned codices (leading vowel kept, tail vowels dropped, run
# collapse, first-3 + last-3 truncation).
PINNED_CODEX = {
    "BYRNE": "BYRN",
    "BOERN": "BRN",
    "CATHERINE": "CTHRN",
    "KATHRYN": "KTHRYN",
    "AARON": "ARN",
    "LLOYD": "LYD",
    "SMITH": "SMTH",
    "SMYTH": "SMYTH",
    "TESTING": "TSTNG",
    "CHRISTENSEN": "CHRSN",  # CHRSTNSN -> CHR + NSN? no: first3+last3
    "A": "A",
    "MISSISSIPPI": "MSP",  # MSSSSPP -> MSP after run collapse
}
# fix the two computed ones below in the test rather than guess here
PINNED_CODEX["CHRISTENSEN"] = mra_codex_py("CHRISTENSEN")
PINNED_CODEX["MISSISSIPPI"] = mra_codex_py("MISSISSIPPI")

# Pinned comparisons: (name_l, name_r) -> (rating, comparable, match).
# BYRNE/BOERN is the worked example in every published description of
# the algorithm: rating 5 against minimum 4 -> match.
PINNED_COMPARE = {
    ("BYRNE", "BOERN"): (5, True, True),
    ("CATHERINE", "KATHRYN"): (4, True, True),
    ("SMITH", "SMYTH"): (5, True, True),
    ("A", "A"): (6, True, True),
    # length gate: |1 - 6| > 2 -> not comparable.
    ("A", "KATHRYN"): (None, False, False),
}


def _fuzz_words(n=300, seed=4117):
    rng = random.Random(seed)
    alpha = string.ascii_uppercase + "AEIOU" * 3 + "BLNR" * 2
    return [
        "".join(rng.choice(alpha) for _ in range(rng.randint(1, 12)))
        for _ in range(n)
    ]


def test_python_codex_pinned():
    for w, want in PINNED_CODEX.items():
        assert mra_codex_py(w) == want, w
    # run-collapse + truncation sanity recomputed by hand:
    assert mra_codex_py("MISSISSIPPI") == "MSP"
    assert mra_codex_py("CHRISTENSEN") == "CHRSTNSN"[:3] + "CHRSTNSN"[-3:]


def test_python_compare_pinned():
    for (a, b), (rating, cmp_ok, match) in PINNED_COMPARE.items():
        got = mra_compare_py(mra_codex_py(a), mra_codex_py(b))
        assert got[1] == cmp_ok and got[2] == match, (a, b, got)
        if rating is not None:
            assert got[0] == rating, (a, b, got)


def test_sql_codex_matches_python_fuzz():
    words = list(PINNED_CODEX) + _fuzz_words()
    con = duckdb.connect()
    got = con.execute(
        f"SELECT w, {mra_codex_sql('w')} FROM (SELECT unnest(?) AS w)",
        [words],
    ).fetchall()
    for w, cdx in got:
        assert cdx == mra_codex_py(w), w


def test_sql_compare_matches_python_fuzz():
    words = _fuzz_words(seed=901)
    pairs = [(words[i], words[i + 1]) for i in range(0, len(words) - 1, 2)]
    pairs += [(a, b) for (a, b) in PINNED_COMPARE]
    con = duckdb.connect()
    fa, fb, rating = mra_rating_sql("cl", "cr")
    rows = con.execute(
        f"""
        WITH p AS (
          SELECT {mra_codex_sql('a')} AS cl, {mra_codex_sql('b')} AS cr
          FROM (SELECT unnest(?) AS a, unnest(?) AS b)
        ), f AS (
          SELECT *, {fa} AS __mra_fa, {fb} AS __mra_fb FROM p
        )
        SELECT cl, cr, {rating},
               {mra_min_rating_sql('cl', 'cr')},
               {mra_comparable_sql('cl', 'cr')}
        FROM f
        """,
        [[a for a, _ in pairs], [b for _, b in pairs]],
    ).fetchall()
    for cl, cr, got_rating, got_minr, got_cmp in rows:
        want_rating, want_cmp, want_match = mra_compare_py(cl, cr)
        assert got_rating == want_rating, (cl, cr)
        assert got_cmp == want_cmp, (cl, cr)
        assert (got_cmp and got_rating >= got_minr) == want_match, (cl, cr)


def test_spark_matches_python_fuzz(spark):
    words = list(PINNED_CODEX) + _fuzz_words(seed=77)
    words += [w.lower() for w in words[:40]]
    pairs = [
        (words[i], words[(i * 7 + 3) % len(words)]) for i in range(len(words))
    ]
    df = spark.createDataFrame(pairs, ["a", "b"]).select(
        "a",
        "b",
        mra_codex("a").alias("cl"),
        mra_codex("b").alias("cr"),
    )
    rating = mra_rating("cl", "cr")
    minr = mra_min_rating("cl", "cr")
    cmp_ok = mra_comparable("cl", "cr")
    out = df.select(
        "a",
        "b",
        "cl",
        "cr",
        rating.alias("rating"),
        (cmp_ok & (rating >= minr)).alias("is_match"),
        cmp_ok.alias("cmp_ok"),
    ).collect()
    for r in out:
        assert r.cl == mra_codex_py(r.a), r.a
        assert r.cr == mra_codex_py(r.b), r.b
        want_rating, want_cmp, want_match = mra_compare_py(r.cl, r.cr)
        assert (r.rating, r.cmp_ok, r.is_match) == (
            want_rating,
            want_cmp,
            want_match,
        ), (r.a, r.b)


def test_contract_query_shape_and_semantics(spark):
    from idd_hw6_record_linkage_spark import entry_queries as EQ

    rows = EQ.rl_mra(spark, "/root/testdata/sf0.001").collect()
    assert rows, "empty contract basis"
    for r in rows:
        assert r.mra_l == mra_codex_py(r.tok_l)
        assert r.mra_r == mra_codex_py(r.tok_r)
        want_rating, want_cmp, want_match = mra_compare_py(r.mra_l, r.mra_r)
        assert (r.rating, r.comparable, r.is_match) == (
            want_rating,
            want_cmp,
            want_match,
        )
        assert r.min_rating in (2, 3, 4, 5)
