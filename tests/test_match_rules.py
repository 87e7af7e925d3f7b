"""Match-rule waterfall (operators/match_rules.py): first-true-wins
provenance, SQL-CASE NULL semantics, and the audit aggregate.

The cascade generalizes the reference's single-threshold decision
(record_linkage.py:271-381 fixed comparator thresholds) into the
MDM-standard ordered rule list with per-pair provenance.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.operators.match_rules import (
    apply_match_rules,
    rule_stats,
)


def _pairs(spark):
    rows = [
        # (id_l, id_r, name_l, name_r, zip_l, zip_r)
        (1, 2, "acme corp", "acme corp", "10001", "10001"),   # rule1+rule2 both true
        (3, 4, "acme corp", "acme korp", "10001", "10001"),   # rule2 (lev<=1)
        (5, 6, "acme corp", "smith llc", "10001", "10001"),   # rule3 (zip equal)
        (7, 8, "acme corp", "smith llc", "10001", "94107"),   # no rule
        (9, 10, None, "acme corp", "10001", "10001"),          # rule1/2 NULL -> rule3
        (11, 12, None, "x", None, "y"),                        # all NULL/false -> no rule
    ]
    return spark.createDataFrame(
        rows, "id_l long, id_r long, name_l string, name_r string, "
        "zip_l string, zip_r string"
    )


def _rules():
    return [
        ("exact_name", F.col("name_l") == F.col("name_r")),
        ("tight_edit", F.levenshtein("name_l", "name_r") <= 1),
        ("same_zip", F.col("zip_l") == F.col("zip_r")),
    ]


def test_first_true_wins_and_null_semantics(spark):
    out = {
        (r.id_l, r.id_r): (r.matched_rule, r.rule_rank)
        for r in apply_match_rules(_pairs(spark), _rules()).collect()
    }
    assert out[(1, 2)] == ("exact_name", 1)    # rule 1 wins over rule 2
    assert out[(3, 4)] == ("tight_edit", 2)
    assert out[(5, 6)] == ("same_zip", 3)
    assert out[(7, 8)] == (None, None)
    # NULL predicate = not matching (SQL CASE), falls through to rule 3:
    assert out[(9, 10)] == ("same_zip", 3)
    assert out[(11, 12)] == (None, None)


def test_rule_stats_counts(spark):
    stats = {
        r.matched_rule: r.n_pairs
        for r in rule_stats(apply_match_rules(_pairs(spark), _rules())).collect()
    }
    assert stats == {"exact_name": 1, "tight_edit": 1, "same_zip": 2, None: 2}


def test_validation_errors(spark):
    pairs = _pairs(spark)
    with pytest.raises(ValueError, match="non-empty"):
        apply_match_rules(pairs, [])
    with pytest.raises(ValueError, match="duplicate"):
        apply_match_rules(
            pairs, [("a", F.lit(True)), ("a", F.lit(False))]
        )
    with pytest.raises(ValueError, match="already exists"):
        apply_match_rules(
            pairs.withColumn("matched_rule", F.lit("x")), _rules()
        )


def test_cascade_is_map_only(spark):
    """The waterfall adds zero exchanges over the input plan."""
    pairs = _pairs(spark)
    plan = (
        apply_match_rules(pairs, _rules())
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
