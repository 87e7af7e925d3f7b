"""DuckDB-convention Jaro / Jaro-Winkler (functions/similarity
``int_trans=True``).

The production C1/C2 comparators follow the jellyfish convention
(t = diffs / 2); DuckDB's native ``jaro_similarity`` implements the
strcmp95/rapidfuzz variant (t = diffs // 2, '' vs '' → 0.0). The
``int_trans`` flag is the ONLY divergence point, so pinning the
rf-mode batch kernel bit-for-bit against DuckDB pins the whole shared
kernel — encode, windowed greedy matching, left-pack transposition
count, Winkler boost — for the production UDFs too (the rl_jaro_duck
contract query repeats the check value-exactly over candidate pairs).
Also asserts the two conventions agree whenever the raw diff count is
even, and that production-mode outputs are untouched by the new flag.
"""

import random

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.functions.similarity import (
    _jaro,
    _jaro_batch,
    _jaro_winkler,
    sim_jaro_rf,
    sim_jaro_winkler_rf,
)


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def _duck_pair(con, a: str, b: str) -> tuple[float, float]:
    return con.execute(
        "SELECT jaro_similarity(?, ?), jaro_winkler_similarity(?, ?)",
        [a, b, a, b],
    ).fetchone()


def _rand_strs(n: int, seed: int, max_len: int = 14) -> list[str]:
    rng = random.Random(seed)
    return [
        "".join(
            rng.choice("abc de") for _ in range(rng.randint(0, max_len))
        )
        for _ in range(n)
    ]


CORNERS = [
    ("", ""),
    ("", "a"),
    ("a", ""),
    ("a", "a"),
    ("ab", "ba"),
    ("martha", "marhta"),
    ("dixon", "dicksonx"),
    ("duane", "dwayne"),
    ("cb  aeaddcce", "d d a"),  # the variant-distinguishing case:
    # jellyfish t=1.5 vs strcmp95 t=1
]


class TestScalarDuckParity:
    def test_corners(self, duck):
        for a, b in CORNERS:
            dj, dw = _duck_pair(duck, a, b)
            assert _jaro(a, b, int_trans=True) == pytest.approx(
                dj, abs=1e-15
            ) or (a == "" and b == "" and dj == 0.0), (a, b)
            # '' vs '' convention is handled in the batch layer, not
            # the scalar (the scalar equality shortcut fires first)
            if not (a == "" and b == ""):
                assert _jaro_winkler(a, b, int_trans=True) == pytest.approx(
                    dw, abs=1e-15
                ), (a, b)

    def test_randomized(self, duck):
        xs = _rand_strs(400, seed=11)
        ys = _rand_strs(400, seed=23)
        for a, b in zip(xs, ys):
            dj, dw = _duck_pair(duck, a, b)
            got = _jaro_batch([a], [b], winkler=False, int_trans=True)[0]
            gotw = _jaro_batch([a], [b], winkler=True, int_trans=True)[0]
            assert got == pytest.approx(dj, abs=1e-15), (a, b)
            assert gotw == pytest.approx(dw, abs=1e-15), (a, b)

    def test_long_strings_scalar_fallback(self, duck):
        rng = random.Random(5)
        for _ in range(20):
            a = "".join(rng.choice("ab c") for _ in range(600))
            b = "".join(rng.choice("ab c") for _ in range(580))
            dj, dw = _duck_pair(duck, a, b)
            assert _jaro_batch([a], [b], winkler=False, int_trans=True)[
                0
            ] == pytest.approx(dj, abs=1e-15)
            assert _jaro_batch([a], [b], winkler=True, int_trans=True)[
                0
            ] == pytest.approx(dw, abs=1e-15)


class TestBatchKernel:
    def test_batch_matches_duck(self, duck):
        xs = _rand_strs(300, seed=31) + [a for a, _ in CORNERS]
        ys = _rand_strs(300, seed=47) + [b for _, b in CORNERS]
        exp_j, exp_w = [], []
        for a, b in zip(xs, ys):
            dj, dw = _duck_pair(duck, a, b)
            exp_j.append(dj)
            exp_w.append(dw)
        got_j = _jaro_batch(xs, ys, winkler=False, int_trans=True)
        got_w = _jaro_batch(xs, ys, winkler=True, int_trans=True)
        for k in range(len(xs)):
            assert got_j[k] == pytest.approx(exp_j[k], abs=1e-15), (
                xs[k],
                ys[k],
            )
            assert got_w[k] == pytest.approx(exp_w[k], abs=1e-15), (
                xs[k],
                ys[k],
            )

    @settings(max_examples=150, deadline=None)
    @given(
        st.text(alphabet="ab d", max_size=20),
        st.text(alphabet="ab d", max_size=20),
    )
    def test_hypothesis_kernel_vs_scalar(self, a, b):
        got = _jaro_batch([a], [b], winkler=True, int_trans=True)[0]
        if a == "" and b == "":
            assert got == 0.0
        else:
            assert got == pytest.approx(
                _jaro_winkler(a, b, int_trans=True), abs=1e-15
            )

    def test_production_mode_unchanged(self):
        # the int_trans default must not disturb jellyfish-convention
        # outputs (reference parity): even-diff pairs agree between the
        # conventions, the distinguishing odd-diff pair must differ.
        a, b = "cb  aeaddcce", "d d a"
        jelly = _jaro_batch([a], [b], winkler=False)[0]
        ducky = _jaro_batch([a], [b], winkler=False, int_trans=True)[0]
        assert jelly == pytest.approx(0.5861111111111111, abs=1e-12)
        assert ducky == pytest.approx(0.6277777777777778, abs=1e-12)
        assert _jaro_batch(["martha"], ["marhta"], winkler=True)[
            0
        ] == pytest.approx(
            _jaro_batch(["martha"], ["marhta"], winkler=True, int_trans=True)[
                0
            ],
            abs=1e-15,
        )


class TestSparkUDF:
    def test_udf_vs_duck(self, spark, duck):
        xs = _rand_strs(120, seed=3)
        ys = _rand_strs(120, seed=9)
        df = spark.createDataFrame(
            list(zip(xs, ys)), ["a", "b"]
        ).withColumns(
            {
                "j": sim_jaro_rf("a", "b"),
                "w": sim_jaro_winkler_rf("a", "b"),
            }
        )
        rows = {(r["a"], r["b"]): (r["j"], r["w"]) for r in df.collect()}
        for a, b in zip(xs, ys):
            dj, dw = _duck_pair(duck, a, b)
            gj, gw = rows[(a, b)]
            assert gj == pytest.approx(dj, abs=1e-15), (a, b)
            assert gw == pytest.approx(dw, abs=1e-15), (a, b)

    def test_arrow_eval_plan(self, spark):
        df = spark.createDataFrame([("x", "y")], ["a", "b"]).select(
            sim_jaro_rf("a", "b")
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" in plan
        assert "BatchEvalPython" not in plan
