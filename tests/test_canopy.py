"""Canopy blocking (operators.canopy): brute-force parity on a toy
corpus (python replica of fate sample, df cap, Jaccard, thresholds,
singleton fallback), coverage/overlap properties, and knob
validation."""

from __future__ import annotations

import hashlib

import pytest

from idd_hw6_record_linkage_spark.operators.canopy import canopy_blocks

DOCS = [
    (1, "red apple pie with cinnamon"),
    (2, "red apple pie with nutmeg"),
    (3, "green pear tart with cinnamon"),
    (4, "red apple pie with cinnamon"),  # exact dup of 1
    (5, "quantum flux capacitor manual"),
    (6, ""),  # zero tokens -> singleton
    (7, None),  # NULL text -> singleton
    (8, "the the the the"),  # single distinct token
]


def _fate(key, salt="canopy"):
    h = hashlib.md5((salt + str(key)).encode()).hexdigest()
    return int(h[:15], 16) / 2**60


def _brute(center_rate, t1, t2, max_df=None):
    toks = {i: set((t or "").lower().split()) for i, t in DOCS}
    if max_df is not None:
        df: dict[str, int] = {}
        for s in toks.values():
            for t in s:
                df[t] = df.get(t, 0) + 1
        toks = {i: {t for t in s if df[t] <= max_df} for i, s in toks.items()}
    centers = [i for i, _ in DOCS if _fate(i) < center_rate]
    out = set()
    covered = set()
    for i, _ in DOCS:
        for c in centers:
            inter = len(toks[i] & toks[c])
            union = len(toks[i] | toks[c])
            if union == 0 or inter == 0:
                continue
            j = inter / union
            if j >= t1:
                out.add((i, c, round(j, 6), j >= t2))
                covered.add(i)
    for i, _ in DOCS:
        if i not in covered:
            out.add((i, i, 1.0, True))
    return out


@pytest.mark.parametrize(
    "center_rate,t1,t2,max_df",
    [(0.5, 0.2, 0.8, None), (0.9, 0.4, 0.6, 2), (0.3, 0.0, 1.0, None)],
)
def test_brute_force_parity(spark, center_rate, t1, t2, max_df):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"]).selectExpr(
        "doc_id", "split(lower(trim(coalesce(text,''))), '\\\\s+') AS toks"
    )
    got = {
        (r.url, r.canopy_id, r.jaccard, r.is_tight)
        for r in canopy_blocks(
            df, "doc_id", "toks", center_rate, t1, t2, max_df
        ).collect()
    }
    want = _brute(center_rate, t1, t2, max_df)
    assert got == want


def test_every_record_covered_and_centers_self_tight(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"]).selectExpr(
        "doc_id", "split(lower(trim(coalesce(text,''))), '\\\\s+') AS toks"
    )
    rows = canopy_blocks(df, "doc_id", "toks", 0.5, 0.2, 0.8).collect()
    assert {r.url for r in rows} == {i for i, _ in DOCS}
    # a token-bearing center is in its own canopy at jaccard 1, tight
    centers = [i for i, t in DOCS if _fate(i) < 0.5 and (t or "").split()]
    for c in centers:
        self_rows = [r for r in rows if r.url == c and r.canopy_id == c]
        assert self_rows and self_rows[0].jaccard == 1.0
        assert self_rows[0].is_tight


def test_knob_validation(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"]).selectExpr(
        "doc_id", "split(lower(trim(coalesce(text,''))), '\\\\s+') AS toks"
    )
    with pytest.raises(ValueError):
        canopy_blocks(df, "doc_id", "toks", center_rate=0.0)
    with pytest.raises(ValueError):
        canopy_blocks(df, "doc_id", "toks", t1=0.9, t2=0.5)
