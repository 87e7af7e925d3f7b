"""Cross-source duplicate-overlap matrix
(operators.dedup.source_overlap_matrix): hand-built cluster
assignments with closed-form pair counts, NULL-source exclusion, and
the no-empty-rows contract."""

from __future__ import annotations

import itertools

from idd_hw6_record_linkage_spark.operators.dedup import (
    source_overlap_matrix,
)

# cluster 1: 2×web + 1×wiki  -> web-web 1, web-wiki 2
# cluster 2: 3×web           -> web-web 3
# cluster 3: 1×wiki + 1×forum -> forum-wiki 1
# cluster 4: singleton web    -> nothing
# cluster 5: 1×web + 1×NULL   -> nothing (NULL source excluded)
ROWS = [
    (1, 1, "web"),
    (2, 1, "web"),
    (3, 1, "wiki"),
    (4, 2, "web"),
    (5, 2, "web"),
    (6, 2, "web"),
    (7, 3, "wiki"),
    (8, 3, "forum"),
    (9, 4, "web"),
    (10, 5, "web"),
    (11, 5, None),
]


def _dfs(spark):
    assign = spark.createDataFrame(
        [(i, c) for i, c, _ in ROWS], ["doc_id", "cluster_id"]
    )
    docs = spark.createDataFrame(
        [(i, s) for i, _, s in ROWS], ["doc_id", "source"]
    )
    return assign, docs


def test_closed_form_counts(spark):
    got = {
        (r.source_l, r.source_r): r.n_dup_pairs
        for r in source_overlap_matrix(*_dfs(spark)).collect()
    }
    assert got == {
        ("web", "web"): 4,  # 1 (cluster 1) + 3 (cluster 2)
        ("web", "wiki"): 2,
        ("forum", "wiki"): 1,
    }


def test_matches_brute_force_pairs(spark):
    src = {i: s for i, _, s in ROWS}
    clu = {i: c for i, c, _ in ROWS}
    brute: dict[tuple, int] = {}
    for a, b in itertools.combinations(sorted(src), 2):
        if clu[a] != clu[b] or src[a] is None or src[b] is None:
            continue
        key = tuple(sorted((src[a], src[b])))
        brute[key] = brute.get(key, 0) + 1
    got = {
        (r.source_l, r.source_r): r.n_dup_pairs
        for r in source_overlap_matrix(*_dfs(spark)).collect()
    }
    assert got == brute
