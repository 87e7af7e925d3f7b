"""Unigram-LM cross-entropy scoring (operators.lm_score): smoothing
math, OOV mass, NULL/blank retention, broadcast-path equality."""

from __future__ import annotations

import math

import pytest

from idd_hw6_record_linkage_spark.operators import lm_score as LM


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


CORPUS = [
    (1, "a a a b"),
    (2, "a b c"),
    (3, "b c c"),
]
# counts: a=4 b=3 c=3, N=10, V=3


def test_fit_unigram_lm_math(spark):
    m = LM.fit_unigram_lm(_docs(spark, CORPUS), alpha=0.5)
    assert (m.total_tokens, m.vocab_size) == (10, 3)
    z = math.log(10 + 0.5 * 4)
    probs = {r["token"]: r["log_prob"] for r in m.vocab.collect()}
    assert probs["a"] == pytest.approx(math.log(4.5) - z)
    assert probs["c"] == pytest.approx(math.log(3.5) - z)
    assert m.oov_log_prob == pytest.approx(math.log(0.5) - z)
    # smoothed distribution sums to 1 over vocab + the one OOV slot
    total = sum(math.exp(p) for p in probs.values()) + math.exp(m.oov_log_prob)
    assert total == pytest.approx(1.0)


def test_lm_score_exact_and_oov(spark):
    m = LM.fit_unigram_lm(_docs(spark, CORPUS), alpha=0.5)
    z = math.log(12.0)
    scored = {
        r["doc_id"]: r
        for r in LM.lm_score(
            _docs(spark, [(10, "a b"), (11, "zzz a"), (12, None), (13, "  ")]),
            m,
        ).collect()
    }
    exp_ab = -(math.log(4.5) - z + math.log(3.5) - z) / 2
    assert scored[10]["cross_entropy"] == pytest.approx(exp_ab)
    assert scored[10]["n_tokens"] == 2
    # OOV token takes the alpha mass
    exp_oov = -(math.log(0.5) - z + math.log(4.5) - z) / 2
    assert scored[11]["cross_entropy"] == pytest.approx(exp_oov)
    # NULL and blank docs are KEPT with zero tokens, NULL entropy
    for d in (12, 13):
        assert scored[d]["n_tokens"] == 0
        assert scored[d]["cross_entropy"] is None
    # log_ppl is the nats alias
    assert scored[10]["log_ppl"] == pytest.approx(scored[10]["cross_entropy"])


def test_broadcast_path_equality(spark):
    docs = _docs(spark, CORPUS + [(4, "q w e r t y")])
    m = LM.fit_unigram_lm(docs)
    a = {r["doc_id"]: r for r in LM.lm_score(docs, m).collect()}
    b = {
        r["doc_id"]: r
        for r in LM.lm_score(docs, m, broadcast_model=True).collect()
    }
    assert set(a) == set(b)
    for k in a:  # join strategy must not change the answer (float sum
        # order may differ in the last ulps — tolerance, not equality)
        assert a[k]["n_tokens"] == b[k]["n_tokens"]
        assert a[k]["cross_entropy"] == pytest.approx(b[k]["cross_entropy"])


def test_fit_validation(spark):
    with pytest.raises(ValueError, match="alpha"):
        LM.fit_unigram_lm(_docs(spark, CORPUS), alpha=0.0)
    with pytest.raises(ValueError, match="no tokens"):
        LM.fit_unigram_lm(_docs(spark, [(1, None), (2, "   ")]))
