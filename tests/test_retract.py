"""Record retraction (operators/retract.py): repair-only deletion must
be value-identical to a from-scratch re-clustering of the filtered
graph — split components, untouched-cluster passthrough, idempotence.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.operators.clustering import (
    clusters_from_edges,
)
from idd_hw6_record_linkage_spark.operators.retract import retract_records


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_l string, id_r string")


def _ids(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id string")


def _removed(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "url string")


def _assign(df):
    return {r.url: r.entity_id for r in df.collect()}


def test_chain_split_and_untouched_passthrough(spark):
    # a-b-c chain + d-e pair + singleton f
    edges = _edges(spark, [("a", "b"), ("b", "c"), ("d", "e")])
    ids = _ids(spark, list("abcdef"))
    clusters = clusters_from_edges(edges, ids)
    out = _assign(retract_records(clusters, edges, _removed(spark, ["b"])))
    # removing the bridge b splits {a,b,c} into singletons {a} {c};
    # {d,e} and {f} pass through with their original labels
    assert out == {"a": "a", "c": "c", "d": "d", "e": "d", "f": "f"}


def test_label_moves_when_min_removed(spark):
    edges = _edges(spark, [("a", "b"), ("b", "c")])
    ids = _ids(spark, list("abc"))
    clusters = clusters_from_edges(edges, ids)
    assert _assign(clusters) == {"a": "a", "b": "a", "c": "a"}
    out = _assign(retract_records(clusters, edges, _removed(spark, ["a"])))
    # b-c stays connected; its new min-id label is b
    assert out == {"b": "b", "c": "b"}


def test_idempotent_on_unknown_and_repeated_ids(spark):
    edges = _edges(spark, [("a", "b")])
    ids = _ids(spark, list("ab"))
    clusters = clusters_from_edges(edges, ids)
    out = retract_records(
        clusters, edges, _removed(spark, ["zz", "zz", "q"])
    )
    assert _assign(out) == _assign(clusters)


def test_equivalence_to_full_recluster_randomized(spark):
    rng = random.Random(42)
    n = 60
    ids = [f"n{i:02d}" for i in range(n)]
    pairs = [
        (a, b)
        for a in ids
        for b in ids
        if a < b and rng.random() < 0.04
    ]
    edges = _edges(spark, pairs)
    all_ids = _ids(spark, ids)
    clusters = clusters_from_edges(edges, all_ids)
    removed = sorted(rng.sample(ids, 9))
    got = _assign(
        retract_records(clusters, edges, _removed(spark, removed))
    )
    rm = set(removed)
    kept_edges = _edges(
        spark, [(a, b) for a, b in pairs if a not in rm and b not in rm]
    )
    kept_ids = _ids(spark, [i for i in ids if i not in rm])
    want = _assign(clusters_from_edges(kept_edges, kept_ids))
    assert got == want


def test_affected_subgraph_only(spark):
    """Edges of untouched clusters never enter the repair CC: the
    repaired side's input is semi-joined to affected members, so a
    corpus of many untouched clusters adds no graph work."""
    edges = _edges(spark, [("a", "b"), ("b", "c"), ("x", "y")])
    ids = _ids(spark, list("abcxy"))
    clusters = clusters_from_edges(edges, ids)
    out = retract_records(clusters, edges, _removed(spark, ["c"]))
    # x/y rows come from the untouched branch (original labels), and
    # the union total is corpus minus removed
    rows = _assign(out)
    assert rows == {"a": "a", "b": "a", "x": "x", "y": "x"}
