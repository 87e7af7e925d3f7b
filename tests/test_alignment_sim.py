"""Smith-Waterman comparator (functions/alignment_sim.py): vectorized
kernel vs scalar DP bit-parity (random + hypothesis), alignment
properties (containment=1, disjoint=0, symmetry), UDF null/empty
conventions, long-string scalar fallback."""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from idd_hw6_record_linkage_spark.functions.alignment_sim import (
    _sw_batch,
    _sw_scalar,
)


def _norm(a: str, b: str) -> float:
    if a == b:
        return 1.0
    if not a or not b:
        return 0.0
    return _sw_scalar(a, b) / min(len(a), len(b))


class TestKernelParity:
    def test_random_batch_matches_scalar_dp(self):
        rng = random.Random(42)
        alpha = "abcde "
        cases = []
        for _ in range(300):
            la, lb = rng.randint(0, 15), rng.randint(0, 15)
            cases.append(
                (
                    "".join(rng.choice(alpha) for _ in range(la)),
                    "".join(rng.choice(alpha) for _ in range(lb)),
                )
            )
        got = _sw_batch([a for a, _ in cases], [b for _, b in cases])
        for i, (a, b) in enumerate(cases):
            assert got[i] == _norm(a, b), (a, b)

    @settings(max_examples=200, deadline=None)
    @given(
        st.text(alphabet="abxy ", max_size=20),
        st.text(alphabet="abxy ", max_size=20),
    )
    def test_hypothesis_parity(self, a, b):
        assert _sw_batch([a], [b])[0] == _norm(a, b)

    def test_long_string_scalar_fallback(self):
        a = "x" * 600 + "needle"
        assert _sw_batch([a], ["needle"])[0] == 1.0


class TestAlignmentProperties:
    def test_contained_substring_scores_one(self):
        assert _sw_batch(["hello world"], ["world"])[0] == 1.0
        assert _sw_batch(["title"], ["spam title | best price"])[0] == 1.0

    def test_disjoint_alphabets_score_zero(self):
        assert _sw_batch(["aaaa"], ["bbbb"])[0] == 0.0

    def test_symmetry(self):
        rng = random.Random(7)
        for _ in range(50):
            a = "".join(rng.choice("abc ") for _ in range(rng.randint(1, 12)))
            b = "".join(rng.choice("abc ") for _ in range(rng.randint(1, 12)))
            assert _sw_batch([a], [b])[0] == _sw_batch([b], [a])[0]

    def test_null_and_empty_conventions(self):
        out = _sw_batch(["a", None, "", ""], [None, "b", "a", ""])
        assert list(out) == [0.0, 0.0, 0.0, 1.0]

    def test_bounds(self):
        rng = random.Random(3)
        a = ["".join(rng.choice("abcd") for _ in range(8)) for _ in range(100)]
        b = ["".join(rng.choice("abcd") for _ in range(8)) for _ in range(100)]
        out = _sw_batch(a, b)
        assert all(0.0 <= v <= 1.0 for v in out)


class TestSparkUdf:
    def test_udf_over_pairs(self, spark):
        from idd_hw6_record_linkage_spark.functions.alignment_sim import (
            sim_smith_waterman,
        )

        rows = [
            ("amazon deals great title", "great title | best price"),
            ("hello world", "world"),
            (None, "x"),
            ("", ""),
        ]
        df = spark.createDataFrame(rows, ["a", "b"]).select(
            "a", "b", sim_smith_waterman("a", "b").alias("sim")
        )
        got = {(r.a, r.b): r.sim for r in df.collect()}
        for a, b in rows:
            if a is None or b is None:
                exp = 0.0
            else:
                exp = _norm(a, b)
            assert got[(a, b)] == exp

    def test_plan_is_arrow_not_batch_python(self, spark):
        from idd_hw6_record_linkage_spark.functions.alignment_sim import (
            sim_smith_waterman,
        )

        df = spark.createDataFrame([("a", "b")], ["a", "b"]).select(
            sim_smith_waterman("a", "b").alias("s")
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" in plan
        assert "BatchEvalPython" not in plan


class TestSwUnitPoint:
    """Prohibitive-penalty corner (sw_unit_udf): normalized SW must
    equal longest-common-substring / min-length — the SQL-expressible
    collapse rl_sw_unit's oracle pins. Brute-force LCS here is an
    INDEPENDENT recomputation (substring set intersection), not the
    kernel's DP."""

    @staticmethod
    def _lcs_brute(a: str, b: str) -> int:
        if not a or not b:
            return 0
        subs = {
            a[i:j]
            for i in range(len(a))
            for j in range(i + 1, len(a) + 1)
        }
        return max(
            (
                j - i
                for i in range(len(b))
                for j in range(i + 1, len(b) + 1)
                if b[i:j] in subs
            ),
            default=0,
        )

    def test_unit_point_equals_lcs_over_min(self):
        import random

        from idd_hw6_record_linkage_spark.functions.alignment_sim import (
            _sw_batch,
        )

        rng = random.Random(411)
        pairs = [("", ""), ("", "a"), ("ab", "ab"), ("abc", "xbcz")]
        for _ in range(300):
            n1, n2 = rng.randint(0, 12), rng.randint(0, 12)
            a = "".join(rng.choice("abcd ") for _ in range(n1))
            b = "".join(rng.choice("abcd ") for _ in range(n2))
            pairs.append((a, b))
        got = _sw_batch(
            [p[0] for p in pairs],
            [p[1] for p in pairs],
            match=1.0,
            mismatch=-100.0,
            gap=100.0,
        )
        for k, (a, b) in enumerate(pairs):
            if a == b:
                exp = 1.0
            elif not a or not b:
                exp = 0.0
            else:
                exp = self._lcs_brute(a, b) / min(len(a), len(b))
            assert abs(got[k] - exp) < 1e-12, (a, b, got[k], exp)
