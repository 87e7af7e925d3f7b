"""Soundex phonetic keys (functions.phonetic): three-way parity
between Spark's native soundex, the pure-Python replica, and the
DuckDB SQL oracle macro, on pinned edge cases plus a seeded fuzz
sweep over the documented [A-Za-z]+ domain."""

from __future__ import annotations

import random
import string

import duckdb
from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.functions.phonetic import (
    soundex_key,
    soundex_py,
    soundex_sql,
)

# Edge cases probed against Spark this session (BENCH/VERDICT trail):
# H/W collapse-through, leading H/W kept, vowel separators, run
# collapse across the first letter, padding/truncation.
PINNED = {
    "ASHCRAFT": "A261",
    "TYMCZAK": "T522",
    "PFISTER": "P236",
    "JACKSON": "J250",
    "AHA": "A000",
    "HALL": "H400",
    "HW": "H000",
    "WH": "W000",
    "ROBERT": "R163",
    "RUPERT": "R163",
    "A": "A000",
    "H": "H000",
    "W": "W000",
    "LLOYD": "L300",
    "HONEYMAN": "H555",
    "AAA": "A000",
    "SHHH": "S000",
    "GHWB": "G100",
    "BOOTH": "B300",
    "WHYTE": "W300",
    "CHWIRUT": "C630",
    "SCHMIDT": "S530",
    "SZYMANSKI": "S552",
}


def _fuzz_words(n=400, seed=1231):
    rng = random.Random(seed)
    # Weight H/W/vowels up so the special rules fire constantly.
    alpha = string.ascii_uppercase + "HWAEIOUY" * 3
    return [
        "".join(rng.choice(alpha) for _ in range(rng.randint(1, 12)))
        for _ in range(n)
    ]


def test_python_replica_matches_pinned():
    for w, want in PINNED.items():
        assert soundex_py(w) == want, w


def test_sql_macro_matches_pinned_and_python_fuzz():
    words = list(PINNED) + _fuzz_words()
    con = duckdb.connect()
    got = con.execute(
        f"SELECT w, {soundex_sql('w')} FROM (SELECT unnest(?) AS w)",
        [words],
    ).fetchall()
    for w, sdx in got:
        assert sdx == soundex_py(w), w


def test_spark_matches_python_fuzz(spark):
    words = list(PINNED) + _fuzz_words(seed=77)
    # Mixed-case rows exercise soundex_key's upper() normalization.
    words += [w.lower() for w in words[:50]] + [w.title() for w in words[:50]]
    df = spark.createDataFrame([(w,) for w in words], ["w"])
    for r in df.select("w", soundex_key("w").alias("s")).collect():
        assert r.s == soundex_py(r.w), r.w


def test_contract_queries_shape(spark):
    from idd_hw6_record_linkage_spark import entry_queries as EQ

    sf_dir = "/root/testdata/sf0.001"
    keys = EQ.rl_soundex_keys(spark, sf_dir)
    assert keys.columns == ["p_partkey", "name_token", "sdx_key"]
    rows = keys.collect()
    assert rows and all(
        r.sdx_key == soundex_py(r.name_token) for r in rows
    )
    blocks = {
        r.sdx_key: (r.n_records, r.n_pairs)
        for r in EQ.rl_soundex_blocks(spark, sf_dir).collect()
    }
    from collections import Counter

    naive = Counter(r.sdx_key for r in rows)
    assert blocks == {
        k: (n, n * (n - 1) // 2) for k, n in naive.items()
    }


class TestRefinedSoundex:
    """Refined Soundex (Commons RefinedSoundex behavior): pinned
    values incl. the documented TESTING -> T6036084, three-way
    Spark == DuckDB == Python parity on fuzz words, refinement
    property vs classic soundex on alpha tokens."""

    PINNED_R = {
        "TESTING": "T6036084",
        "ROBERT": "R901096",
        "RUPERT": "R901096",
        "": "",
        "AAAA": "A0",
        "BBBB": "B1",
        "MCDONALD": "M83608076",
    }

    def test_python_replica_pinned(self):
        from idd_hw6_record_linkage_spark.functions.phonetic import (
            refined_soundex_py,
        )

        for w, want in self.PINNED_R.items():
            assert refined_soundex_py(w) == want, w

    def test_three_way_parity_fuzz(self, spark):
        import duckdb

        from idd_hw6_record_linkage_spark.functions.phonetic import (
            refined_soundex_key,
            refined_soundex_py,
            refined_soundex_sql,
        )

        words = list(self.PINNED_R) + _fuzz_words(seed=31)
        words += [w.lower() for w in words[:40]] + ["McD onald-9", "a1b2"]
        df = spark.createDataFrame([(w,) for w in words], ["w"])
        got_spark = {
            r.w: r.k
            for r in df.select(
                "w", refined_soundex_key("w").alias("k")
            ).collect()
        }
        con = duckdb.connect()
        expr = refined_soundex_sql("w")
        for w in words:
            py = refined_soundex_py(w)
            assert got_spark[w] == py, w
            duck = con.execute(
                f"SELECT {expr} FROM (SELECT ? AS w)", [w]
            ).fetchone()[0]
            assert duck == py, w

    def test_refines_classic_soundex_blocks(self, spark):
        # records sharing a refined key must share the classic key
        # (refined keeps strictly more distinctions) — checked on the
        # contract query output
        from idd_hw6_record_linkage_spark import entry_queries as EQ

        rows = EQ.rl_refined_soundex(spark, "/root/testdata/sf0.001").collect()
        by_refined = {}
        for r in rows:
            by_refined.setdefault(r.rsdx_key, set()).add(r.sdx_key)
        assert all(len(v) == 1 for v in by_refined.values())


class TestNysiis:
    """NYSIIS key (functions.phonetic.nysiis_*): pinned classics,
    Spark == DuckDB == Python parity on fuzz words, and key-shape
    properties (alpha-only, first letter preserved, 6-char cap)."""

    # Classic NYSIIS examples the pinned pass-chain reproduces
    # (MACINTOSH/KNIGHT/PHILLIP/LUKASIEWICZ are the canonical cited
    # test vectors); the last rows pin OUR variant's documented
    # divergences and edge behavior.
    PINNED_N = {
        "MACINTOSH": "MCANT",
        "KNIGHT": "NAGT",
        "PHILLIP": "FALAP",
        "PFEIFFER": "FAFAR",
        "SCHMIDT": "SNAD",
        "LUKASIEWICZ": "LACASA",
        "EVANS": "EVAN",
        "BENTLEY": "BANTLY",
        "LAWSON": "LASAN",
        "HORVATH": "HARVAT",
        "WASHINGTON": "WASANG",
        "BROWN": "BRAN",
        "O'DONNELL": "ODANAL",
        "AHA": "AH",
        "AEIOU": "A",
        "H": "H",
        "": "",
        "McD onald-9": "MCDANA",
    }

    def test_python_replica_pinned(self):
        from idd_hw6_record_linkage_spark.functions.phonetic import (
            nysiis_py,
        )

        for w, want in self.PINNED_N.items():
            assert nysiis_py(w) == want, w

    def test_three_way_parity_fuzz(self, spark):
        import duckdb

        from idd_hw6_record_linkage_spark.functions.phonetic import (
            nysiis_key,
            nysiis_py,
            nysiis_sql,
        )

        words = list(self.PINNED_N) + _fuzz_words(seed=47)
        words += [w.lower() for w in words[:40]]
        df = spark.createDataFrame([(w,) for w in words], ["w"])
        got_spark = {
            r.w: (r.k, r.kf)
            for r in df.select(
                "w",
                nysiis_key("w").alias("k"),
                nysiis_key("w", max_len=0).alias("kf"),
            ).collect()
        }
        con = duckdb.connect()
        e6 = nysiis_sql("w")
        ef = nysiis_sql("w", max_len=0)
        for w in words:
            py6, pyf = nysiis_py(w), nysiis_py(w, max_len=0)
            assert got_spark[w] == (py6, pyf), w
            duck = con.execute(
                f"SELECT {e6}, {ef} FROM (SELECT ? AS w)", [w]
            ).fetchone()
            assert tuple(duck) == (py6, pyf), w

    def test_key_shape_properties(self):
        import re

        from idd_hw6_record_linkage_spark.functions.phonetic import (
            nysiis_py,
        )

        for w in _fuzz_words(seed=53):
            k6 = nysiis_py(w)
            kf = nysiis_py(w, max_len=0)
            assert len(k6) <= 6 and k6 == kf[:6]
            assert re.fullmatch("[A-Z]*", kf)
            # first letter of the (head-transcoded) name survives
            assert not kf or kf[0] in "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
            # truncation is the ONLY difference between the two forms
            assert kf.startswith(k6)


class TestCologne:
    """Kölner Phonetik (cologne_key/_sql/_py): canonical published
    vectors, three-way Spark == DuckDB == Python parity on fuzz words
    weighted toward the context-rule letters, and key-shape
    properties (digits only, no non-leading zeros)."""

    # Canonical vectors from the published algorithm description,
    # plus pinned edge cases of OUR pass order (X-after-initial-C,
    # initial-C-alone, PH, sibilant contexts).
    PINNED_K = {
        "MUELLER": "657",
        "BRESCHNEW": "17863",
        "WIKIPEDIA": "3412",
        "BACH": "14",
        "MATSCH": "68",
        "HEINZ": "068",
        "PHILIPP": "351",
        "CX": "48",
        "KX": "48",
        "ACX": "048",
        "C": "8",
        "CA": "4",
        "SC": "8",
        "X": "48",
        "PH": "3",
        "TSCH": "8",
        "H": "",
    }

    def test_python_replica_pinned(self):
        from idd_hw6_record_linkage_spark.functions.phonetic import (
            cologne_py,
        )

        for w, want in self.PINNED_K.items():
            assert cologne_py(w) == want, (w, cologne_py(w))

    def test_sql_matches_python_fuzz(self):
        from idd_hw6_record_linkage_spark.functions.phonetic import (
            cologne_py,
            cologne_sql,
        )

        rng = random.Random(991)
        alpha = string.ascii_uppercase + "AEIOUHCXSZDTKQP" * 2
        words = [
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 12)))
            for _ in range(500)
        ] + list(self.PINNED_K)
        con = duckdb.connect()
        got = con.execute(
            f"SELECT w, {cologne_sql('w')} FROM (SELECT unnest(?) AS w)",
            [words],
        ).fetchall()
        for w, k in got:
            assert k == cologne_py(w), w

    def test_spark_matches_python_fuzz(self, spark):
        from idd_hw6_record_linkage_spark.functions.phonetic import (
            cologne_key,
            cologne_py,
        )

        rng = random.Random(77)
        alpha = string.ascii_uppercase + "AEIOUHCXSZDTKQP" * 2
        words = [
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 12)))
            for _ in range(400)
        ] + list(self.PINNED_K)
        words += [w.lower() for w in words[:40]]
        df = spark.createDataFrame([(w,) for w in words], ["w"])
        for r in df.select("w", cologne_key("w").alias("k")).collect():
            assert r.k == cologne_py(r.w), r.w

    def test_key_shape_properties(self):
        from idd_hw6_record_linkage_spark.functions.phonetic import (
            cologne_py,
        )

        rng = random.Random(5)
        for _ in range(300):
            w = "".join(
                rng.choice(string.ascii_uppercase)
                for _ in range(rng.randint(1, 15))
            )
            k = cologne_py(w)
            assert all(c in "012345678" for c in k), (w, k)
            assert "0" not in k[1:], (w, k)  # only a LEADING zero
            # NOTE: adjacent duplicate codes CAN survive — the run
            # collapse happens BEFORE zero removal, so codes that
            # were separated by a vowel (e.g. GYG -> 404 -> 44) stay
            # distinct, exactly as the published algorithm specifies.
