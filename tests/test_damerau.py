"""Damerau-Levenshtein comparator (functions/damerau.py): vectorized
kernel vs scalar DP parity (random + hypothesis), scalar DP vs
DuckDB's damerau_levenshtein (the oracle basis — unrestricted variant
over UTF-8 bytes), metric/edit properties, UDF null conventions and
Arrow plan shape."""

from __future__ import annotations

import random

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from idd_hw6_record_linkage_spark.functions.damerau import (
    _dl_batch,
    _dl_scalar,
)


def _ref(a: str, b: str) -> int:
    return _dl_scalar(a.encode("utf-8"), b.encode("utf-8"))


class TestScalarVsDuckDB:
    """The scalar DP must match DuckDB's damerau_levenshtein exactly —
    this is what makes the rl_damerau contract query value-exact."""

    def test_known_variant_cases(self):
        con = duckdb.connect()
        # CA->ABC distinguishes unrestricted DL (2) from OSA (3).
        for a, b in [
            ("CA", "ABC"),
            ("abcd", "acbd"),
            ("the", "hte"),
            ("", "abc"),
            ("", ""),
            ("héllo", "hello"),  # byte basis: é is 2 UTF-8 bytes
            ("日本語", "日語本"),
        ]:
            exp = con.execute(
                "select damerau_levenshtein(?, ?)", [a, b]
            ).fetchone()[0]
            assert _ref(a, b) == exp, (a, b)

    def test_random_unicode_vs_duckdb(self):
        con = duckdb.connect()
        rng = random.Random(42)
        alpha = "abcdeé 日xyz"
        for _ in range(300):
            a = "".join(
                rng.choice(alpha) for _ in range(rng.randint(0, 12))
            )
            b = "".join(
                rng.choice(alpha) for _ in range(rng.randint(0, 12))
            )
            exp = con.execute(
                "select damerau_levenshtein(?, ?)", [a, b]
            ).fetchone()[0]
            assert _ref(a, b) == exp, (a, b)


class TestKernelParity:
    def test_random_batch_matches_scalar_dp(self):
        rng = random.Random(7)
        alpha = "abcde é"
        cases = []
        for _ in range(400):
            la, lb = rng.randint(0, 15), rng.randint(0, 15)
            cases.append(
                (
                    "".join(rng.choice(alpha) for _ in range(la)),
                    "".join(rng.choice(alpha) for _ in range(lb)),
                )
            )
        got = _dl_batch([a for a, _ in cases], [b for _, b in cases])
        for i, (a, b) in enumerate(cases):
            assert got[i] == _ref(a, b), (a, b)

    @settings(max_examples=200, deadline=None)
    @given(
        st.text(alphabet="abxy é", max_size=20),
        st.text(alphabet="abxy é", max_size=20),
    )
    def test_hypothesis_parity(self, a, b):
        assert _dl_batch([a], [b])[0] == _ref(a, b)

    def test_long_string_scalar_fallback(self):
        a = "x" * 100 + "abc"
        b = "x" * 100 + "acb"
        assert _dl_batch([a], [b])[0] == 1


class TestEditProperties:
    def test_transposition_is_one_edit(self):
        assert _dl_batch(["hte"], ["the"])[0] == 1

    def test_symmetry(self):
        rng = random.Random(3)
        for _ in range(50):
            a = "".join(
                rng.choice("abc ") for _ in range(rng.randint(0, 12))
            )
            b = "".join(
                rng.choice("abc ") for _ in range(rng.randint(0, 12))
            )
            assert _dl_batch([a], [b])[0] == _dl_batch([b], [a])[0]

    def test_triangle_inequality(self):
        rng = random.Random(11)
        for _ in range(60):
            s = [
                "".join(
                    rng.choice("abcd") for _ in range(rng.randint(0, 10))
                )
                for _ in range(3)
            ]
            dab = _dl_batch([s[0]], [s[1]])[0]
            dbc = _dl_batch([s[1]], [s[2]])[0]
            dac = _dl_batch([s[0]], [s[2]])[0]
            assert dac <= dab + dbc

    def test_null_and_empty_conventions(self):
        # None is treated as '' (callers coalesce upstream).
        out = _dl_batch(["abc", None, "", ""], [None, "xy", "abc", ""])
        assert list(out) == [3, 2, 3, 0]

    def test_bound_by_max_len(self):
        rng = random.Random(5)
        for _ in range(80):
            a = "".join(
                rng.choice("abcd") for _ in range(rng.randint(0, 10))
            )
            b = "".join(
                rng.choice("wxyz") for _ in range(rng.randint(0, 10))
            )
            assert _dl_batch([a], [b])[0] == max(len(a), len(b))


class TestSparkUdf:
    def test_udf_and_similarity(self, spark):
        from pyspark.sql import functions as F

        from idd_hw6_record_linkage_spark.functions.damerau import (
            damerau_distance,
            sim_damerau,
        )

        rows = [("the", "hte"), ("abcd", "abcd"), ("", "xy"), (None, "a")]
        df = spark.createDataFrame(rows, ["a", "b"]).select(
            "a",
            "b",
            damerau_distance("a", "b").alias("d"),
            F.round(sim_damerau("a", "b"), 6).alias("s"),
        )
        got = {(r.a, r.b): (r.d, r.s) for r in df.collect()}
        assert got[("the", "hte")] == (1, 0.666667)
        assert got[("abcd", "abcd")] == (0, 1.0)
        assert got[("", "xy")] == (2, 0.0)
        assert got[(None, "a")][0] == 1  # NULL coalesced to ''

    def test_plan_is_arrow_not_batch_python(self, spark):
        from idd_hw6_record_linkage_spark.functions.damerau import (
            damerau_distance,
        )

        df = spark.createDataFrame([("a", "b")], ["a", "b"]).select(
            damerau_distance("a", "b").alias("d")
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" in plan
        assert "BatchEvalPython" not in plan
