"""Bootstrap CI (A8) and subgroup recall (A9) tests."""

from __future__ import annotations

from idd_hw6_record_linkage_spark.operators.evaluation import (
    bootstrap_f1_ci,
    precision_recall_f1,
    subgroup_recall,
)


def test_bootstrap_ci_brackets_point_f1(spark):
    truth = spark.createDataFrame(
        [(f"a{i}", f"b{i}") for i in range(60)], "id_l string, id_r string"
    )
    # predict 50 of 60 true + 5 spurious
    preds = spark.createDataFrame(
        [(f"a{i}", f"b{i}") for i in range(50)]
        + [(f"x{i}", f"y{i}") for i in range(5)],
        "id_l string, id_r string",
    )
    point = precision_recall_f1(preds, truth).f1
    lo, hi = bootstrap_f1_ci(preds, truth, n_resamples=300, seed=42)
    assert lo <= point <= hi
    assert 0.0 < lo < hi < 1.0


def test_subgroup_recall(spark):
    truth = spark.createDataFrame(
        [("a1", "b1"), ("a2", "b2"), ("a3", "b3"), ("a4", "b4")],
        "id_l string, id_r string",
    )
    preds = spark.createDataFrame(
        [("a1", "b1"), ("a3", "b3")], "id_l string, id_r string"
    )
    attrs = spark.createDataFrame(
        [("a1", "old"), ("a2", "old"), ("a3", "new"), ("a4", "new")],
        "url string, era string",
    )
    got = {
        r["bucket"]: (r["n_true"], r["n_found"], r["recall"])
        for r in subgroup_recall(preds, truth, attrs, "era").collect()
    }
    assert got["old"] == (2, 1, 0.5)
    assert got["new"] == (2, 1, 0.5)


def test_feature_means(spark):
    from idd_hw6_record_linkage_spark.operators.evaluation import feature_means

    feats = spark.createDataFrame(
        [(0.5, 1.0), (0.7, 0.0), (0.9, 0.5)], "a double, b double"
    )
    row = feature_means(feats, ["a", "b"]).collect()[0]
    assert abs(row["avg_a"] - 0.7) < 1e-9
    assert abs(row["avg_b"] - 0.5) < 1e-9


def test_impossible_match_rate(spark):
    from idd_hw6_record_linkage_spark.operators.evaluation import (
        impossible_match_rate,
    )

    # reference semantics (3_audit_models.py:206-249): |year gap| > 1
    attrs = spark.createDataFrame(
        [("u1", 2010), ("u2", 2010), ("u3", 2015), ("u4", 2011)],
        "url string, year int",
    )
    matches = spark.createDataFrame(
        [("u1", "u2"), ("u1", "u3"), ("u1", "u4")], "id_l string, id_r string"
    )
    row = impossible_match_rate(
        matches, attrs, id_col="url", attr_col="year", max_gap=1
    ).collect()[0]
    assert row["n_matches"] == 3
    assert row["n_impossible"] == 1  # only u1-u3 (gap 5)
    assert abs(row["impossible_rate"] - 1 / 3) < 1e-5


def test_score_auc_matches_naive_mann_whitney(spark):
    """rl_score_auc's integer Mann-Whitney form vs a naive tie-aware
    AUC on the same sf0.001 scored pairs."""
    from idd_hw6_record_linkage_spark import entry_queries as EQ

    sf = "/root/testdata/sf0.001"
    got = EQ.rl_score_auc(spark, sf).collect()[0]

    scored = {
        (r.id_l, r.id_r): r.score
        for r in EQ.rl_pair_features(spark, sf).collect()
    }
    docs = [
        (r.doc_id, r.source, r.n_chars)
        for r in EQ._docs(spark, sf).select(
            "doc_id", "source", "n_chars"
        ).collect()
    ]
    truth = {
        (a, b)
        for a, sa, na in docs
        for b, sb, nb in docs
        if sa is not None and sa == sb and a < b and abs(na - nb) <= 10
    }
    pos = [s for p, s in scored.items() if p in truth]
    neg = [s for p, s in scored.items() if p not in truth]
    assert got.n_pos == len(pos) and got.n_neg == len(neg)
    num = sum(
        1.0 if sp > sn else (0.5 if sp == sn else 0.0)
        for sp in pos
        for sn in neg
    )
    assert abs(got.auc - round(num / (len(pos) * len(neg)), 6)) < 1e-9
    assert got.auc > 0.9  # score must actually rank the planted truth
