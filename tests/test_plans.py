"""Physical-plan assertions: pushdown, pruning, broadcast, no
cartesian products — the 100-TB hygiene checks (a plan that scans all
columns for a 2-column projection is wrong regardless of test scale)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_parquet(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    q = docs.where(F.col("lang") == "en").select("doc_id")
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan, plan


def test_column_pruning_minimal_readschema(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    q = docs.select("doc_id", "lang")
    plan = _plan(q)
    # scan must read only the projected columns
    assert "ReadSchema: struct<doc_id:bigint,lang:string>" in plan, plan


def test_entry_block_stats_prunes_text(spark):
    """rl_block_stats only needs source+lang — the wide text column
    must not be read."""
    from idd_hw6_record_linkage_spark.entry_queries import rl_block_stats

    plan = _plan(rl_block_stats(spark, SF_DIR))
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read and "text" not in read[0], read


def test_small_dim_broadcast(spark):
    from idd_hw6_record_linkage_spark.entry_queries import join_topk_customers

    plan = _plan(join_topk_customers(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan


def test_candidate_join_is_hash_equijoin_not_cartesian(spark):
    from idd_hw6_record_linkage_spark.operators import blocking

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    keys = blocking.key_table(
        docs, "doc_id", F.concat_ws("_", "source", "lang"), "b1"
    )
    pairs = blocking.candidate_pairs_self(keys)
    plan = _plan(pairs)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan
    assert "block_key" in plan


def test_comparators_stay_in_codegen(spark):
    """Native comparators (levenshtein/gauss/jaccard/exact) must sit
    inside WholeStageCodegen — no Python eval nodes in the plan."""
    from idd_hw6_record_linkage_spark.entry_queries import rl_pair_features

    # AQE wraps the plan and hides codegen stages until execution;
    # disable it for this static inspection only.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = _plan(rl_pair_features(spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    # executedPlan.toString marks codegen stages with '*(n)'
    assert "*(" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_scoring_udf_is_arrow_batched(spark):
    """The Jaro-Winkler comparator is the ONE sanctioned Python spot —
    and it must be Arrow-batched (ArrowEvalPython), never row-at-a-time
    (BatchEvalPython)."""
    from idd_hw6_record_linkage_spark.functions.similarity import sim_jaro_winkler

    df = spark.createDataFrame([("a", "b")], "s1 string, s2 string")
    plan = _plan(df.select(sim_jaro_winkler("s1", "s2").alias("x")))
    assert "ArrowEvalPython" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_tfidf_and_cross_source_no_cartesian(spark):
    """The sparse TF-IDF pair join and the cross-source match join must
    both stay hash equi-joins — a cartesian here is a 100-TB disaster."""
    from idd_hw6_record_linkage_spark.entry_queries import (
        pair_tfidf_cosine,
        rl_cross_source_matches,
    )

    for q in (pair_tfidf_cosine, rl_cross_source_matches):
        plan = _plan(q(spark, SF_DIR))
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoop" not in plan, plan


def test_scaling_scoring_stage_is_map_only(spark):
    """The bench's timed scaling section (comparator evaluation over a
    pre-enriched pair table) must contain NO exchange: map-side
    expressions + Arrow UDF only."""
    from idd_hw6_record_linkage_spark.operators import scoring

    enriched = spark.createDataFrame(
        [("a", "b", "x.com", "x.com", "t u v", "t u w",
          [1, 2, 3], [1, 2, 4], 10, 12)],
        "id_l string, id_r string, domain_l string, domain_r string,"
        "title_norm_l string, title_norm_r string,"
        "text_tokens_l array<bigint>, text_tokens_r array<bigint>,"
        "n_chars_l int, n_chars_r int",
    )
    feats = scoring.compute_features_enriched(enriched, scoring.WEB_P1)
    scored = scoring.score(feats, scoring.WEB_P1)
    plan = _plan(scored.where(F.col("score") >= 0.5))
    assert "Exchange" not in plan, plan
