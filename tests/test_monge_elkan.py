"""Monge-Elkan token-set similarity (functions.monge_elkan): edge
semantics, three-way parity (native Spark expr / JW pandas UDF /
scalar Python replica), SQL-oracle agreement, and the contract query's
shape."""

from __future__ import annotations

import random
import string

import duckdb
import pytest
from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.functions.monge_elkan import (
    monge_elkan,
    monge_elkan_py,
    monge_elkan_sql,
    monge_elkan_sym,
    sim_monge_elkan_jw,
)
from idd_hw6_record_linkage_spark.functions.similarity import (
    _jaro_winkler,
)


def _lev_inner_py(x: str, y: str) -> float:
    m = max(len(x), len(y))
    if m == 0:
        return 1.0
    prev = list(range(len(y) + 1))
    for i, cx in enumerate(x, 1):
        cur = [i] + [0] * len(y)
        for j, cy in enumerate(y, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (cx != cy))
        prev = cur
    return 1.0 - prev[-1] / m


def _fuzz_rows(n=250, seed=99):
    rng = random.Random(seed)

    def tok():
        return "".join(
            rng.choice(string.ascii_lowercase[:5])
            for _ in range(rng.randint(0, 6))
        )

    rows = [
        (
            i,
            [tok() for _ in range(rng.randint(0, 5))],
            [tok() for _ in range(rng.randint(0, 5))],
        )
        for i in range(n)
    ]
    rows += [
        (n, None, ["a"]),
        (n + 1, ["a"], None),
        (n + 2, [], []),
        (n + 3, [], ["x"]),
        (n + 4, ["paul", "johnson"], ["johson", "paule"]),
    ]
    return rows


def test_edge_semantics_and_python_parity(spark):
    rows = _fuzz_rows()
    df = spark.createDataFrame(rows, ["i", "a", "b"])
    got = {
        r.i: (r.fwd, r.sym)
        for r in df.select(
            "i",
            monge_elkan("a", "b").alias("fwd"),
            monge_elkan_sym("a", "b").alias("sym"),
        ).collect()
    }
    for i, a, b in rows:
        want = monge_elkan_py(a, b, _lev_inner_py)
        fwd, sym = got[i]
        if want is None:
            assert fwd is None and sym is None, i
        else:
            assert fwd == pytest.approx(want, abs=1e-9), (i, a, b)
            back = monge_elkan_py(b, a, _lev_inner_py)
            assert sym == pytest.approx((want + back) / 2, abs=1e-9), i


def test_sql_oracle_matches_python():
    rows = _fuzz_rows(seed=123)
    con = duckdb.connect()
    got = con.execute(
        f"SELECT i, {monge_elkan_sql('a', 'b')} FROM "
        "(SELECT unnest(?) i, unnest(?) a, unnest(?) b)",
        [[r[0] for r in rows], [r[1] for r in rows], [r[2] for r in rows]],
    ).fetchall()
    want = {r[0]: monge_elkan_py(r[1], r[2], _lev_inner_py) for r in rows}
    for i, v in got:
        if want[i] is None:
            assert v is None, i
        else:
            assert v == pytest.approx(want[i], abs=1e-9), i


def test_jw_udf_matches_scalar_replica(spark):
    rows = _fuzz_rows(seed=7)
    df = spark.createDataFrame(rows, ["i", "a", "b"])
    got = {
        r.i: r.s
        for r in df.select(
            "i", sim_monge_elkan_jw("a", "b").alias("s")
        ).collect()
    }
    for i, a, b in rows:
        want = monge_elkan_py(a, b, _jaro_winkler)
        if want is None:
            assert got[i] is None, i
        else:
            assert got[i] == pytest.approx(want, abs=1e-9), (i, a, b)


def test_contract_query_shape(spark):
    from idd_hw6_record_linkage_spark import entry_queries as EQ

    df = EQ.rl_monge_elkan(spark, "/root/testdata/sf0.001")
    assert df.columns == ["id_l", "id_r", "me_fwd", "me_sym"]
    rows = df.collect()
    assert rows
    for r in rows:
        assert r.me_fwd is None or 0.0 <= r.me_fwd <= 1.0
        assert r.me_sym is None or 0.0 <= r.me_sym <= 1.0
