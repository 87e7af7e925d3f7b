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


class TestMatchExplanations:
    """rl_match_explanations: contribution algebra against the pair
    features it decomposes (sums, weakest-feature selection with the
    pinned tie-break, gap bounds)."""

    def test_decomposition_algebra(self, spark):
        from idd_hw6_record_linkage_spark import entry_queries as EQ

        sf = "/root/testdata/sf0.001"
        feats = {
            (r.id_l, r.id_r): r
            for r in EQ.rl_pair_features(spark, sf)
            .where("score >= 0.5")
            .collect()
        }
        rows = EQ.rl_match_explanations(spark, sf).collect()
        assert len(rows) == len(feats) > 0
        for r in rows:
            f = feats[(r.id_l, r.id_r)]
            sims = {
                "lev_sim": f.lev_sim,
                "jaccard_sim": f.jaccard_sim,
                "nchars_sim": f.nchars_sim,
            }
            assert r.c_lev == round(f.lev_sim / 3.0, 6)
            assert r.c_jaccard == round(f.jaccard_sim / 3.0, 6)
            assert r.c_nchars == round(f.nchars_sim / 3.0, 6)
            # contributions reassemble the score (each side rounded)
            assert abs((r.c_lev + r.c_jaccard + r.c_nchars) - r.score) < 3e-6
            # weakest = argmin with CASE-order tie-break
            lo = min(sims.values())
            order = ["lev_sim", "jaccard_sim", "nchars_sim"]
            assert r.weakest_feature == next(
                k for k in order if sims[k] == lo
            )
            assert abs(r.strength_gap - (max(sims.values()) - lo)) < 2e-6
            assert 0.0 <= r.strength_gap <= 1.0


def test_source_rates_consistency(spark):
    """dedup_source_rates: rates recompute from the raw assignment,
    and totals reconcile with the document counts per source."""
    from idd_hw6_record_linkage_spark import entry_queries as EQ

    sf = "/root/testdata/sf0.001"
    assign = {
        r.doc_id: r.cluster_id
        for r in EQ.dedup_doc_clusters(spark, sf).collect()
    }
    src = {
        r.doc_id: r.source
        for r in EQ._docs(spark, sf).select("doc_id", "source").collect()
    }
    naive: dict[str, list[int]] = {}
    for d, c in assign.items():
        s = src[d]
        if s is None:
            continue
        tot_dup = naive.setdefault(s, [0, 0])
        tot_dup[0] += 1
        tot_dup[1] += int(d != c)
    rows = EQ.dedup_source_rates(spark, sf).collect()
    got = {r.source: (r.n_docs, r.n_dups, r.dup_rate) for r in rows}
    assert got == {
        s: (t, d, round(d / t, 6)) for s, (t, d) in naive.items()
    }
