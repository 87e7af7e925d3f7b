"""Fellegi-Sunter EM (operators.fellegi_sunter): parameter recovery
on data generated from known (λ, m, u), posterior separation, weight
math, NULL-gamma conventions, validation."""

from __future__ import annotations

import math
import random

import pytest

from idd_hw6_record_linkage_spark.operators import fellegi_sunter as FS

FEATS = ["g_name", "g_zip", "g_year"]
TRUE = {
    "lam": 0.3,
    "m": {"g_name": 0.95, "g_zip": 0.85, "g_year": 0.9},
    "u": {"g_name": 0.05, "g_zip": 0.2, "g_year": 0.35},
}


def _synth(spark, n=20_000, seed=7):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        is_match = rng.random() < TRUE["lam"]
        src = TRUE["m"] if is_match else TRUE["u"]
        rows.append(
            (i, int(is_match))
            + tuple(int(rng.random() < src[f]) for f in FEATS)
        )
    return spark.createDataFrame(
        rows, "pair_id long, truth int, g_name int, g_zip int, g_year int"
    )


def test_em_recovers_planted_parameters(spark):
    pairs = _synth(spark)
    params = FS.em_fit(pairs, FEATS, max_iter=50)
    assert params.lam == pytest.approx(TRUE["lam"], abs=0.03)
    for f in FEATS:
        assert params.m[f] == pytest.approx(TRUE["m"][f], abs=0.03), f
        assert params.u[f] == pytest.approx(TRUE["u"][f], abs=0.03), f
    assert math.isfinite(params.avg_log_likelihood)


def test_posterior_separates_and_weight_is_monotone(spark):
    pairs = _synth(spark, n=10_000, seed=11)
    params = FS.em_fit(pairs, FEATS, max_iter=50)
    scored = FS.match_posterior(
        FS.match_weight(pairs, params, FEATS), params, FEATS
    )
    rows = scored.groupBy("truth").avg("match_probability").collect()
    by_truth = {r["truth"]: r["avg(match_probability)"] for r in rows}
    assert by_truth[1] > 0.7 > 0.3 > by_truth[0]
    # weight and posterior must rank pairs identically (both are
    # monotone in the likelihood ratio)
    two = (
        scored.select("match_weight", "match_probability")
        .distinct()
        .collect()
    )
    two.sort(key=lambda r: r["match_weight"])
    probs = [r["match_probability"] for r in two]
    assert probs == sorted(probs)


def test_weight_closed_form(spark):
    params = FS.FSParams(
        lam=0.25,
        m={"g": 0.9},
        u={"g": 0.1},
        n_iter=1,
        avg_log_likelihood=0.0,
    )
    df = spark.createDataFrame(
        [(1, 1), (2, 0), (3, None)], "id long, g int"
    )
    out = {
        r["id"]: r["match_weight"]
        for r in FS.match_weight(df, params, ["g"]).collect()
    }
    prior = math.log2(0.25 / 0.75)
    assert out[1] == pytest.approx(prior + math.log2(9.0))
    assert out[2] == pytest.approx(prior + math.log2(0.1 / 0.9))
    assert out[3] == pytest.approx(prior)  # NULL gamma: no evidence


def test_null_gammas_excluded_from_msteps(spark):
    # feature g2 is NULL everywhere: EM must leave it at the clip
    # boundary ratios without poisoning lam or g1
    df = spark.createDataFrame(
        [(i, 1 if i % 3 == 0 else 0, None) for i in range(300)],
        "id long, g1 int, g2 int",
    )
    params = FS.em_fit(df, ["g1", "g2"], max_iter=5)
    assert 0.0 < params.lam < 1.0
    assert math.isfinite(params.m["g2"]) and math.isfinite(params.u["g2"])


def test_validation(spark):
    df = spark.createDataFrame([(1, 1)], "id long, g int")
    with pytest.raises(ValueError, match="non-empty"):
        FS.em_fit(df, [])
    with pytest.raises(ValueError, match="lam0"):
        FS.em_fit(df, ["g"], lam0=1.0)
    with pytest.raises(ValueError, match="nothing to fit"):
        FS.em_fit(df.where("id < 0"), ["g"])


def test_term_frequencies(spark):
    df = spark.createDataFrame(
        [("en",), ("en",), ("en",), ("de",), (None,)], "lang string"
    )
    tf = {
        r["lang"]: r["tf"]
        for r in FS.term_frequencies(df, "lang").collect()
    }
    assert tf == {"en": pytest.approx(0.75), "de": pytest.approx(0.25)}


def test_tf_adjusted_weight_closed_form(spark):
    params = FS.FSParams(
        lam=0.2,
        m={"g_a": 0.9, "g_lang": 0.95},
        u={"g_a": 0.1, "g_lang": 0.5},
        n_iter=0,
        avg_log_likelihood=0.0,
    )
    feats = ["g_a", "g_lang"]
    # pair 1 agrees on a COMMON value, pair 2 on a RARE one, pair 3
    # disagrees, pair 4 agrees on a value missing from the tf table.
    pairs = spark.createDataFrame(
        [
            (1, 1, 1, "en"),
            (2, 1, 1, "xx"),
            (3, 1, 0, None),
            (4, 1, 1, "zz"),
        ],
        "pid int, g_a int, g_lang int, lang string",
    )
    tf = spark.createDataFrame(
        [("en", 0.8), ("xx", 0.001)], "lang string, tf double"
    )
    out = {
        r["pid"]: r["match_weight"]
        for r in FS.tf_adjusted_weight(
            pairs, params, feats, "g_lang", "lang", tf
        ).collect()
    }
    base = {
        r["pid"]: r["match_weight"]
        for r in FS.match_weight(pairs, params, feats).collect()
    }

    def adj(tf_v):
        return math.log2(0.5 / tf_v)

    assert out[1] == pytest.approx(base[1] + adj(0.8))
    assert out[2] == pytest.approx(base[2] + adj(0.001))
    assert out[3] == pytest.approx(base[3])  # disagreement: unadjusted
    assert out[4] == pytest.approx(base[4])  # unknown value: unadjusted
    # rare agreement must outweigh common agreement
    assert out[2] > out[1]
    # common-value agreement is weaker than the generic u suggests
    assert out[1] < base[1]

    # floor caps the rare-value boost
    floored = {
        r["pid"]: r["match_weight"]
        for r in FS.tf_adjusted_weight(
            pairs, params, feats, "g_lang", "lang", tf, tf_floor=0.01
        ).collect()
    }
    assert floored[2] == pytest.approx(base[2] + adj(0.01))

    with pytest.raises(ValueError, match="feature_cols"):
        FS.tf_adjusted_weight(pairs, params, feats, "g_zip", "lang", tf)


def test_classify_bands(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -5.0), (4, None)], "pid int, w double"
    )
    bands = {
        r["pid"]: r["band"]
        for r in FS.classify_bands(df, "w", upper=3.0, lower=-3.0).collect()
    }
    assert bands == {
        1: "match", 2: "possible", 3: "non_match", 4: "possible"
    }
    with pytest.raises(ValueError, match="lower"):
        FS.classify_bands(df, "w", upper=-1.0, lower=1.0)
