"""BLANC cluster metric (operators.evaluation.blanc): hand-computed
toys incl. every degenerate convention, plus a brute-force pair-level
replica on seeded random assignments."""

from __future__ import annotations

import itertools
import random

from idd_hw6_record_linkage_spark.operators.evaluation import blanc


def _df(spark, assign, col):
    return spark.createDataFrame(
        [(k, v) for k, v in assign.items()], ["url", col]
    )


def _brute(pred: dict, truth: dict):
    ids = sorted(set(pred) & set(truth))
    co_p = {
        (a, b)
        for a, b in itertools.combinations(ids, 2)
        if pred[a] == pred[b]
    }
    co_t = {
        (a, b)
        for a, b in itertools.combinations(ids, 2)
        if truth[a] == truth[b]
    }
    allp = set(itertools.combinations(ids, 2))
    nc_p, nc_t = allp - co_p, allp - co_t

    def pr(right, sys_n, gold_n):
        p = right / sys_n if sys_n else 0.0
        r = right / gold_n if gold_n else 0.0
        return (2 * p * r / (p + r)) if p + r > 0 else 0.0

    f_c = pr(len(co_p & co_t), len(co_p), len(co_t))
    f_n = pr(len(nc_p & nc_t), len(nc_p), len(nc_t))
    if not co_t and not co_p:
        bl = f_n
    elif not nc_t and not nc_p:
        bl = f_c
    else:
        bl = (f_c + f_n) / 2
    return round(f_c, 6), round(f_n, 6), round(bl, 6)


def _run(spark, pred, truth):
    row = blanc(
        _df(spark, pred, "entity_id"), _df(spark, truth, "truth_id")
    ).collect()[0]
    return row


def test_perfect_agreement_mixed(spark):
    pred = {"a": 1, "b": 1, "c": 2}
    row = _run(spark, pred, pred)
    assert (row.blanc_c, row.blanc_n, row.blanc) == (1.0, 1.0, 1.0)
    assert (row.links_gold, row.links_sys, row.links_right) == (1, 1, 1)


def test_all_one_cluster_both_sides_degenerate_coref_only(spark):
    pred = {"a": 1, "b": 1}
    row = _run(spark, pred, pred)
    # rn2 = sn2 = 0 -> BLANC = f_c alone
    assert (row.blanc_c, row.blanc) == (1.0, 1.0)


def test_all_singletons_both_sides_degenerate_noncoref_only(spark):
    pred = {"a": 1, "b": 2, "c": 3}
    row = _run(spark, pred, pred)
    # rc2 = sc2 = 0 -> BLANC = f_n alone
    assert (row.blanc_n, row.blanc) == (1.0, 1.0)


def test_hand_computed_shatter(spark):
    row = _run(
        spark,
        {"a": 1, "b": 2, "c": 3},
        {"a": "x", "b": "x", "c": "y"},
    )
    # f_c = 0 (no predicted links), f_n = 0.8, BLANC = 0.4
    assert (row.blanc_c, row.blanc_n, row.blanc) == (0.0, 0.8, 0.4)
    assert (row.links_gold, row.links_sys, row.links_right) == (1, 0, 0)


def test_brute_force_parity_random(spark):
    for seed in (1, 9, 23):
        rng = random.Random(seed)
        ids = [f"r{i}" for i in range(40)]
        pred = {i: rng.randint(0, 6) for i in ids}
        truth = {i: rng.randint(0, 4) for i in ids}
        row = _run(spark, pred, truth)
        assert (row.blanc_c, row.blanc_n, row.blanc) == _brute(pred, truth)
