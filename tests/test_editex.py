"""Editex phonetic edit distance (functions/editex).

Triangulation: a fully independent pure-python textbook DP (own group
table, own recurrence — sharing nothing with the module) must agree
with BOTH the scalar fallback and the vectorized batch kernel on
randomized and adversarial inputs; the unit-cost mode must equal
2·levenshtein (the property that makes rl_editex_unit value-exact
against DuckDB); production editex must satisfy the provable sandwich
0 ≤ editex ≤ 2·levenshtein, symmetry, and the phonetic discounts that
are the operator's reason to exist (group substitutions cost 1,
doubled-letter and silent-h/w deletions cost 0/1)."""

import random

from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.functions.editex import (
    _editex_batch,
    _editex_scalar,
    editex_distance,
    editex_unit_distance,
    sim_editex,
)

_GROUPS = (
    "aeiouy", "bp", "ckq", "dt", "lr", "mn", "gj", "fpv", "sxz", "csz"
)
_PAIRS = {
    (x, y) for g in _GROUPS for x in g for y in g
}


def _r(x: str, y: str) -> int:
    if x == y:
        return 0
    return 1 if (x, y) in _PAIRS else 2


def _d(x: str, y: str) -> int:
    """Deletion cost of y preceded by x in the same string."""
    if x != y and y in "hw":
        return 1
    return _r(x, y)


def _editex_ref(a: str, b: str) -> int:
    """Independent textbook DP with a sentinel prefix."""
    sa, sb = "\x00" + a, "\x00" + b
    la, lb = len(a), len(b)
    dp = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(1, la + 1):
        dp[i][0] = dp[i - 1][0] + _d(sa[i - 1], sa[i])
    for j in range(1, lb + 1):
        dp[0][j] = dp[0][j - 1] + _d(sb[j - 1], sb[j])
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            dp[i][j] = min(
                dp[i - 1][j] + _d(sa[i - 1], sa[i]),
                dp[i][j - 1] + _d(sb[j - 1], sb[j]),
                dp[i - 1][j - 1] + _r(sa[i], sb[j]),
            )
    return dp[la][lb]


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        cur = [i] + [0] * len(b)
        for j in range(1, len(b) + 1):
            cur[j] = min(
                prev[j - 1] + (a[i - 1] != b[j - 1]),
                prev[j] + 1,
                cur[j - 1] + 1,
            )
        prev = cur
    return prev[len(b)]


def _rand_pairs(n: int, seed: int) -> list[tuple[str, str]]:
    rng = random.Random(seed)
    alpha = "abcdhw pst01"  # letters + silent hw + digits + space
    out = []
    for _ in range(n):
        la, lb = rng.randint(0, 16), rng.randint(0, 16)
        a = "".join(rng.choice(alpha) for _ in range(la))
        b = "".join(rng.choice(alpha) for _ in range(lb))
        out.append((a, b))
    return out


HAND = [
    ("", ""),
    ("a", ""),
    ("", "hw"),
    ("ab", "ab"),
    ("ab", "ac"),      # b/c share no group: 2
    ("ad", "at"),      # d/t same group: 1
    ("ah", "a"),       # delete silent h: 1
    ("aab", "ab"),     # doubled-letter deletion: 0
    ("ghost", "gost"),
    ("nelson", "neilsen"),
    ("w", "h"),
    ("hw", "wh"),
    ("mit", "mat"),    # i/a same vowel group: 1
]


def test_ref_hand_values():
    got = {(a, b): _editex_ref(a, b) for a, b in HAND}
    assert got[("ab", "ac")] == 2
    assert got[("ad", "at")] == 1
    assert got[("ah", "a")] == 1
    assert got[("aab", "ab")] == 0
    assert got[("mit", "mat")] == 1
    assert got[("", "")] == 0
    assert got[("a", "")] == 2
    # leading h costs 1 (silent), then w after h costs 1
    assert got[("", "hw")] == 2


def test_kernel_matches_independent_reference():
    pairs = _rand_pairs(400, 7) + HAND
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    batch = _editex_batch(a, b, unit=False)
    for k, (x, y) in enumerate(pairs):
        want = _editex_ref(x, y)
        assert batch[k] == want, (x, y, int(batch[k]), want)
        assert _editex_scalar(x, y) == want, (x, y)
        # symmetry through the batch path
    rev = _editex_batch(b, a, unit=False)
    assert (batch == rev).all()


def test_unit_mode_is_twice_levenshtein():
    pairs = _rand_pairs(300, 13) + HAND
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    unit = _editex_batch(a, b, unit=True)
    prod = _editex_batch(a, b, unit=False)
    for k, (x, y) in enumerate(pairs):
        assert unit[k] == 2 * _lev(x, y), (x, y)
        assert 0 <= prod[k] <= unit[k], (x, y)  # the sandwich


def test_hypothesis_sweep():
    try:
        from hypothesis import given, settings
        from hypothesis import strategies as st
    except ImportError:  # pragma: no cover
        return

    alpha = "abdht w0"

    @settings(max_examples=150, deadline=None)
    @given(
        st.text(alphabet=alpha, max_size=12),
        st.text(alphabet=alpha, max_size=12),
    )
    def check(a, b):
        got = _editex_batch([a], [b], unit=False)[0]
        assert got == _editex_ref(a, b)
        assert _editex_batch([a], [b], unit=True)[0] == 2 * _lev(a, b)

    check()


def test_spark_udfs_and_conventions(spark):
    df = spark.createDataFrame(
        [
            ("p1", "ghost", "gost"),
            ("p2", None, "abc"),
            ("p3", None, None),
            ("p4", "same", "same"),
            ("p5", "aab", "ab"),
        ],
        ["id", "a", "b"],
    )
    got = {
        r["id"]: (r["dist"], r["unit"], r["sim"])
        for r in df.select(
            "id",
            editex_distance("a", "b").alias("dist"),
            editex_unit_distance("a", "b").alias("unit"),
            sim_editex("a", "b").alias("sim"),
        ).collect()
    }
    assert got["p1"][0] == _editex_ref("ghost", "gost")
    assert got["p1"][1] == 2 * _lev("ghost", "gost")
    assert got["p2"][0] == _editex_ref("", "abc") and got["p2"][2] == 0.0
    assert got["p3"] == (0, 0, 0.0)
    assert got["p4"] == (0, 0, 1.0)
    assert got["p5"][0] == 0
    assert got["p5"][2] == 1.0 - 0.0  # zero distance -> sim 1.0


def test_long_string_fallback():
    a = "abcd" * 200  # 800 chars > _VEC_MAX_LEN
    b = "abcd" * 199 + "abct"
    got = _editex_batch([a], [b], unit=False)[0]
    assert got == _editex_ref(a, b)


def test_plan_is_arrow_batched(spark):
    df = spark.createDataFrame([("aa", "ab")], ["a", "b"])
    plan = df.select(
        editex_distance("a", "b")
    )._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
