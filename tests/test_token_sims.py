"""Token-set similarity family (rl_pair_token_sims) and the FS
gamma-pattern frequency profile (rl_gamma_patterns): hand-checked
values on planted rows plus contract-shape checks on testdata."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark import entry_queries as EQ

SF = "/root/testdata/sf0.001"


def test_token_sims_hand_checked(spark):
    # A = {a,b,c}, B = {b,c,d,e}: inter=2, dice=4/7, overlap=2/3,
    # cosine=2/sqrt(12).
    df = spark.createDataFrame(
        [([1, 2, 3], [2, 3, 4, 5])], ["toks_l", "toks_r"]
    )
    inter = F.size(F.array_intersect("toks_l", "toks_r")).cast("double")
    nl, nr = F.size("toks_l"), F.size("toks_r")
    r = df.select(
        (2.0 * inter / (nl + nr)).alias("dice"),
        (inter / F.least(nl, nr)).alias("ovl"),
        (inter / F.sqrt((nl * nr).cast("double"))).alias("cos"),
    ).collect()[0]
    assert r.dice == pytest.approx(4 / 7)
    assert r.ovl == pytest.approx(2 / 3)
    assert r.cos == pytest.approx(2 / math.sqrt(12))


def test_token_sims_contract_shape(spark):
    df = EQ.rl_pair_token_sims(spark, SF)
    assert df.columns == ["id_l", "id_r", "dice_sim", "overlap_sim", "cosine_sim"]
    rows = df.collect()
    assert rows
    for r in rows:
        for v in (r.dice_sim, r.overlap_sim, r.cosine_sim):
            assert v is None or 0.0 <= v <= 1.0
        if r.dice_sim is not None:
            # overlap >= cosine >= dice always (min <= sqrt(nl*nr) <= mean)
            assert r.overlap_sim >= r.cosine_sim - 1e-6
            assert r.cosine_sim >= r.dice_sim - 1e-6


def test_gamma_patterns_sums_to_pairs(spark):
    pats = EQ.rl_gamma_patterns(spark, SF).collect()
    n_pairs = EQ.rl_pair_features(spark, SF).count()
    assert sum(p.n_pairs for p in pats) == n_pairs
    assert sum(p.share for p in pats) == pytest.approx(1.0, abs=1e-4)
    assert all(set((p.g_lev, p.g_jac, p.g_nc)) <= {0, 1} for p in pats)
