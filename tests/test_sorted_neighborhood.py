"""Sorted-neighborhood blocking: exact global positions without a
global window, window-pair semantics, mega-key tie splitting."""

from __future__ import annotations

import pytest

from idd_hw6_record_linkage_spark.operators import sorted_neighborhood as SN


def _df(spark, rows):
    return spark.createDataFrame(rows, "rid long, key string")


def _naive_pairs(rows, window):
    ordered = sorted(
        [(k, i) for i, k in rows if k is not None]
    )  # (key, id) global order
    out = set()
    for a in range(len(ordered)):
        for b in range(a + 1, min(a + window, len(ordered))):
            out.add((ordered[a][1], ordered[b][1], b - a))
    return out


ROWS = [
    (1, "smith"), (2, "smyth"), (3, "adams"), (4, "smith"),
    (5, "jones"), (6, "adamson"), (7, "zeta"), (8, None),
    (9, "jonas"), (10, "smitty"),
]


@pytest.mark.parametrize("parts", [1, 3, 7])
def test_positions_exact_any_partitioning(spark, parts):
    pos = {
        r["rid"]: r["pos"]
        for r in SN.global_sort_positions(
            _df(spark, ROWS), "rid", "key", num_partitions=parts
        ).collect()
    }
    expected = {
        i: p
        for p, (_, i) in enumerate(
            sorted((k, i) for i, k in ROWS if k is not None)
        )
    }
    assert pos == expected  # NULL-key row 8 absent


@pytest.mark.parametrize("window", [2, 3, 5])
def test_pairs_match_naive(spark, window):
    got = {
        (r["id_l"], r["id_r"], r["pos_dist"])
        for r in SN.sorted_neighborhood_pairs(
            _df(spark, ROWS), "rid", "key", window=window, num_partitions=4
        ).collect()
    }
    assert got == _naive_pairs(ROWS, window)


def test_mega_key_ties_split_by_id(spark):
    # every record shares ONE key: the id tiebreak must still give a
    # total order (and range partitioning must not serialize it)
    rows = [(i, "same") for i in range(50)]
    pos = {
        r["rid"]: r["pos"]
        for r in SN.global_sort_positions(
            _df(spark, rows), "rid", "key", num_partitions=8
        ).collect()
    }
    assert pos == {i: i for i in range(50)}


def test_window_validation(spark):
    with pytest.raises(ValueError, match="window"):
        SN.sorted_neighborhood_pairs(_df(spark, ROWS), "rid", "key", window=1)


def test_empty_input(spark):
    out = SN.sorted_neighborhood_pairs(
        _df(spark, []).where("rid > 0"), "rid", "key", window=3
    )
    assert out.count() == 0


def test_positions_unique_at_multipartition_scale(spark, tmp_path):
    """Regression: positions must be a permutation of 0..n-1 even when
    the ranged projection spans many partitions of a parquet scan —
    the re-executed range exchange used to re-sample different
    boundaries between the counts job and the window job (measured:
    5,043 duplicate positions at 200k rows / 16 partitions), so the
    operator now pins the assignment with an eager localCheckpoint."""
    from pyspark.sql import functions as F

    n = 100_000
    recs = (
        spark.range(n)
        .withColumnRenamed("id", "rid")
        .withColumn(
            "sort_key",
            F.concat(
                F.lpad(
                    ((F.xxhash64("rid") % 1000 + 1000) % 1000).cast("string"),
                    4, "0",
                ),
                F.lit("-"),
                F.col("rid").cast("string"),
            ),
        )
    )
    src = str(tmp_path / "recs")
    recs.write.mode("overwrite").parquet(src)
    recs = spark.read.parquet(src)
    pos = SN.global_sort_positions(recs, "rid", "sort_key",
                                   num_partitions=16)
    stats = pos.agg(
        F.count("*").alias("n"),
        F.countDistinct("pos").alias("nd"),
        F.min("pos").alias("lo"),
        F.max("pos").alias("hi"),
    ).collect()[0]
    assert (stats["n"], stats["nd"], stats["lo"], stats["hi"]) == (
        n, n, 0, n - 1,
    )
    pairs = SN.sorted_neighborhood_pairs(
        recs, "rid", "sort_key", window=4, num_partitions=16
    )
    assert pairs.count() == 3 * n - 6
