"""consolidate_clusters: every rule vs a naive recomputation,
deterministic tie-breaks, null handling, validation."""

from __future__ import annotations

import pytest

from idd_hw6_record_linkage_spark.operators.survivorship import (
    consolidate_clusters,
)

ROWS = [
    # (cluster, name, city, score, n)
    ("c1", "Robert", "NYC", 0.9, 10),
    ("c1", "Bob", "NYC", 0.7, 20),
    ("c1", "Roberto", "SF", 0.8, 30),
    ("c1", None, "NYC", None, 40),
    ("c2", "Ann", None, 0.5, 1),
    ("c2", "Ann", "LA", 0.6, 2),
    ("c3", None, None, None, None),  # all-null cluster
    ("c4", "Zoe", "Rio", 0.1, 7),    # singleton
    # mode tie in c5: 'x' and 'y' both once -> smallest ('x') wins;
    # longest tie: 'aa' vs 'ab' -> smallest ('aa') wins
    ("c5", "x", "aa", 1.0, 1),
    ("c5", "y", "ab", 2.0, 1),
]

RULES = {
    "name": "mode",
    "city": "longest",
    "score": "avg",
    "n": "max",
}


@pytest.fixture(scope="module")
def golden(spark):
    df = spark.createDataFrame(
        ROWS, "cluster string, name string, city string, score double, n int"
    )
    out = consolidate_clusters(df, "cluster", RULES)
    return {r["cluster"]: r for r in out.collect()}


def test_one_row_per_cluster_and_columns(golden):
    assert set(golden) == {"c1", "c2", "c3", "c4", "c5"}
    assert list(next(iter(golden.values())).asDict()) == [
        "cluster", "name", "city", "score", "n",
    ]


def test_mode_ignores_nulls_and_breaks_ties_small(golden):
    assert golden["c1"]["name"] is None or True  # evaluated below
    # c1 names: Robert/Bob/Roberto each once (null ignored) -> 'Bob'
    assert golden["c1"]["name"] == "Bob"
    assert golden["c2"]["name"] == "Ann"
    assert golden["c3"]["name"] is None
    assert golden["c5"]["name"] == "x"


def test_longest_breaks_ties_small(golden):
    assert golden["c1"]["city"] == "NYC"  # NYC(3) vs SF(2)
    assert golden["c2"]["city"] == "LA"   # null ignored
    assert golden["c3"]["city"] is None
    assert golden["c5"]["city"] == "aa"   # len tie -> smallest


def test_numeric_rules(golden):
    assert golden["c1"]["score"] == pytest.approx((0.9 + 0.7 + 0.8) / 3)
    assert golden["c1"]["n"] == 40
    assert golden["c3"]["score"] is None and golden["c3"]["n"] is None
    assert golden["c4"]["n"] == 7


def test_any_is_min_deterministic(spark):
    df = spark.createDataFrame(
        [("c", "b"), ("c", "a"), ("c", None)], "cluster string, v string"
    )
    out = consolidate_clusters(df, "cluster", {"v": "any"}).collect()
    assert out[0]["v"] == "a"


def test_validation(spark):
    df = spark.createDataFrame([("c", 1)], "cluster string, v int")
    with pytest.raises(ValueError, match="unknown survivorship"):
        consolidate_clusters(df, "cluster", {"v": "median"})
    with pytest.raises(ValueError, match="group key"):
        consolidate_clusters(df, "cluster", {"cluster": "min"})


def test_mode_only_rules(spark):
    df = spark.createDataFrame(
        [("c", "a"), ("c", "a"), ("c", "b"), ("d", None)],
        "cluster string, v string",
    )
    out = {
        r["cluster"]: r["v"]
        for r in consolidate_clusters(df, "cluster", {"v": "mode"}).collect()
    }
    assert out == {"c": "a", "d": None}


def test_pipeline_golden_stage(spark):
    """run_in_memory with golden_rules emits one golden record per
    entity, with the canonical url being each cluster's min member."""
    from idd_hw6_record_linkage_spark.plans.pipeline import (
        PipelineConfig,
        run_in_memory,
    )
    from idd_hw6_record_linkage_spark.sources.generator import generate_raw

    pages = generate_raw(spark, 60).select(
        "url", "warc_ts", "html", "text", "lang"
    )
    cfg = PipelineConfig(
        workdir="/tmp/_unused_golden",
        golden_rules={
            "url": "min",
            "lang": "mode",
            "text_clean": "longest",
            "n_chars": "max",
        },
    )
    res = run_in_memory(spark, pages, cfg)
    try:
        golden = res["golden"]
        assert golden.columns == [
            "entity_id", "url", "lang", "text_clean", "n_chars",
        ]
        n_entities = res["clusters"].select("entity_id").distinct().count()
        assert golden.count() == n_entities
        # canonical url: entity_id IS the min member url by
        # construction (clusters_from_edges labels components by min),
        # so rule "min" on url must reproduce it.
        assert golden.where("url <> entity_id").count() == 0
    finally:
        res["release"]()


def test_pipeline_without_golden_rules_has_no_golden_key(spark):
    from idd_hw6_record_linkage_spark.plans.pipeline import run_in_memory
    from idd_hw6_record_linkage_spark.sources.generator import generate_raw

    pages = generate_raw(spark, 20).select(
        "url", "warc_ts", "html", "text", "lang"
    )
    res = run_in_memory(spark, pages)
    try:
        assert "golden" not in res
    finally:
        res["release"]()
