"""Blocking: key tables, skew-safe candidate-pair generation, stats.

The reference builds ``dict {block_key: [row indices]}`` in Python
loops and takes within-key Cartesian products (blocking_B1.py:79-89,
130-154). Here a blocking pass is a ``(record_id, block_key)``
DataFrame and candidate generation is an equi-join on ``block_key`` —
the within-block Cartesian product is exactly the join output, and
Spark executes it shuffle-partitioned with AQE skew splitting.

Skew controls (SURVEY §4 — absent in the reference, mandatory at web
scale where mega-domains create hot keys):

- **block-size cap**: blocks larger than ``max_block_size`` are split
  deterministically into sub-blocks by ``pmod(xxhash64(id), n_sub)``.
  This bounds the quadratic pair blowup per key. The cap changes the
  candidate set (documented, deterministic, recorded in stats).
- **AQE skew-join** handles residual imbalance at runtime.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def key_table(df: DataFrame, id_col: str, key_expr: Column, pass_name: str,
              salt_basis: Column | None = None,
              extra_cols: list[str] | None = None) -> DataFrame:
    """(id, block_key, pass[, salt_basis][, *extra_cols]) rows; null
    keys dropped (blocking_B1.py:85). ``salt_basis`` is an optional
    content-derived column consumed by :func:`cap_blocks`.
    ``extra_cols`` are passed through verbatim — the streaming
    incremental path uses this to carry the event-time column (for the
    watermarked pair dedup) and the new-side comparator attributes
    (joining them back later would be a stream-stream join)."""
    cols = [F.col(id_col).alias("id"), key_expr.alias("block_key")]
    if salt_basis is not None:
        cols.append(salt_basis.alias("salt_basis"))
    cols.extend(F.col(c) for c in (extra_cols or []))
    return (
        df.select(*cols)
        .where(F.col("block_key").isNotNull())
        .withColumn("pass", F.lit(pass_name))
    )


def _oversized(sizes: DataFrame, threshold: int, target: int | None = None) -> DataFrame:
    """Blocks with n > threshold, each with n_sub = ceil(n / target)
    sub-blocks (target defaults to threshold)."""
    return sizes.where(F.col("n") > threshold).select(
        "block_key",
        F.ceil(F.col("n") / (target or threshold)).cast("int").alias("n_sub"),
    )


def _apply_salt(keys: DataFrame, big: DataFrame, basis: Column,
                flag: str | None = None) -> DataFrame:
    """key -> key#pmod(xxhash64(basis), n_sub) for keys in ``big``;
    broadcast of the (small) oversized-key list so normal keys take the
    fast path untouched. ``flag`` optionally marks rows that were salted."""
    out = keys.join(F.broadcast(big), "block_key", "left")
    out = out.withColumn(
        "block_key",
        F.when(
            F.col("n_sub").isNotNull(),
            F.concat_ws("#", "block_key", F.pmod(basis, F.col("n_sub")).cast("string")),
        ).otherwise(F.col("block_key")),
    )
    if flag is not None:
        out = out.withColumn(flag, F.col("n_sub").isNotNull())
    return out.drop("n_sub")


def cap_blocks(keys: DataFrame, max_block_size: int,
               salt_col: str | None = None) -> DataFrame:
    """Deterministically split oversized blocks into ~max_block_size
    sub-blocks: key -> key#salt with salt = pmod(xxhash64(basis), n_sub).

    ``salt_col`` is the *salt basis*: when it is a content-derived
    column (e.g. a title-prefix), records with similar content land in
    the same sub-block, so the cap costs almost no recall — true
    duplicate pairs stay co-located. Without it the basis falls back to
    the record id, which splits duplicate pairs across sub-blocks
    (recall loss inside oversized blocks; other blocking passes must
    recover those pairs).

    Content-derived salting has a failure mode: if every record in an
    oversized block shares one basis value (empty titles coalescing to
    the same prefix), the whole block lands in a single sub-block and
    the cap is defeated. A second, id-based tier catches that: sizes of
    the *salted* sub-blocks are re-checked, and any at more than 4x the
    cap are split by record id — a guaranteed-entropy basis — accepting
    the documented recall loss inside those blocks in exchange for a
    hard quadratic bound. The 4x slack separates ordinary content
    clustering (a slot collecting a few coarse bases) from genuine
    collapse (the whole block in one slot overshoots by ~n_sub x):
    residual sub-blocks are bounded by 4x cap, never by the data.
    """
    sizes = keys.groupBy("block_key").agg(F.count("*").alias("n"))
    big = _oversized(sizes, max_block_size)
    basis = F.xxhash64(salt_col) if salt_col else F.xxhash64("id")
    salted = _apply_salt(keys, big, basis, flag="_salted")
    if salt_col is None:
        # id basis is already max-entropy; one tier suffices.
        return salted.drop("_salted")
    sizes2 = (
        salted.where(F.col("_salted"))
        .groupBy("block_key")
        .agg(F.count("*").alias("n"))
    )
    big2 = _oversized(sizes2, 4 * max_block_size, target=max_block_size)
    return _apply_salt(salted, big2, F.xxhash64("id")).drop("_salted")


def cap_blocks_pair(
    keys_l: DataFrame, keys_r: DataFrame, max_block_size: int,
    salt_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Cross-source variant of :func:`cap_blocks`: ONE oversized-block
    list and ONE n_sub modulus computed over the union of both sources'
    key tables, applied identically to both sides.

    Capping each side independently is wrong for linkage: a block over
    the cap on only one side (or with different moduli) gets salted
    keys ('key#0..n') on that side and plain 'key' on the other, so the
    cross-source equi-join silently drops candidates for exactly the
    hot blocks the cap targets.
    """
    both = keys_l.select("block_key").unionAll(keys_r.select("block_key"))
    big = _oversized(
        both.groupBy("block_key").agg(F.count("*").alias("n")), max_block_size
    )
    basis = F.xxhash64(salt_col) if salt_col else F.xxhash64("id")
    out_l = _apply_salt(keys_l, big, basis, flag="_salted")
    out_r = _apply_salt(keys_r, big, basis, flag="_salted")
    if salt_col is None:
        return out_l.drop("_salted"), out_r.drop("_salted")
    # second tier (content salt collapsed): same union-consistent list.
    salted_union = (
        out_l.where(F.col("_salted")).select("block_key")
        .unionAll(out_r.where(F.col("_salted")).select("block_key"))
    )
    big2 = _oversized(
        salted_union.groupBy("block_key").agg(F.count("*").alias("n")),
        4 * max_block_size,
        target=max_block_size,
    )
    # NOTE: the second tier salts by record id — ids from different
    # sources land in arbitrary sub-blocks, so residual oversized
    # blocks trade cross-source recall for the hard quadratic bound
    # (exactly the documented cap semantics).
    return (
        _apply_salt(out_l, big2, F.xxhash64("id")).drop("_salted"),
        _apply_salt(out_r, big2, F.xxhash64("id")).drop("_salted"),
    )


def candidate_pairs_self(keys: DataFrame) -> DataFrame:
    """Self-linkage candidates: within-block pairs, canonical order
    id_l < id_r, deduped across blocks/passes (J3+J4 in SURVEY §2.4)."""
    left = keys.select(F.col("id").alias("id_l"), "block_key")
    right = keys.select(F.col("id").alias("id_r"), "block_key")
    pairs = left.join(right, "block_key").where(F.col("id_l") < F.col("id_r"))
    return pairs.select("id_l", "id_r").dropDuplicates(["id_l", "id_r"])


def candidate_pairs_cross(keys_l: DataFrame, keys_r: DataFrame) -> DataFrame:
    """Two-source candidates (reference main case: Craigslist × US)."""
    left = keys_l.select(F.col("id").alias("id_l"), "block_key")
    right = keys_r.select(F.col("id").alias("id_r"), "block_key")
    return (
        left.join(right, "block_key")
        .select("id_l", "id_r")
        .dropDuplicates(["id_l", "id_r"])
    )


def union_pairs(*pair_dfs: DataFrame) -> DataFrame:
    """J4: union of blocking passes, set semantics."""
    out = pair_dfs[0]
    for p in pair_dfs[1:]:
        out = out.unionByName(p)
    return out.dropDuplicates(["id_l", "id_r"])


# --- statistics (A2-A4 in SURVEY §2.5) --------------------------------------


def block_size_stats(keys: DataFrame) -> DataFrame:
    """Per-strategy block stats: count/mean/median/min/max + histogram
    buckets (blocking_B1.py:92-127). Count-shaped fields coalesce to 0
    so an EMPTY key table (e.g. a filtered-to-nothing input) yields a
    well-typed zero row instead of NULLs that crash int() at the
    metrics sink; mean/median/min/max stay NULL — honestly undefined
    over zero blocks."""
    sizes = keys.groupBy("block_key").agg(F.count("*").alias("size"))

    def z(col: F.Column) -> F.Column:
        return F.coalesce(col, F.lit(0)).cast("long")

    return sizes.agg(
        F.count("*").alias("n_blocks"),
        z(F.sum("size")).alias("records_in_blocks"),
        F.avg("size").alias("mean_size"),
        F.expr("percentile_approx(size, 0.5)").alias("median_size"),
        F.min("size").alias("min_size"),
        F.max("size").alias("max_size"),
        z(F.sum((F.col("size") == 1).cast("long"))).alias("blocks_1"),
        z(F.sum(F.col("size").between(2, 5).cast("long"))).alias("blocks_2_5"),
        z(F.sum(F.col("size").between(6, 10).cast("long"))).alias("blocks_6_10"),
        z(F.sum(F.col("size").between(11, 50).cast("long"))).alias(
            "blocks_11_50"
        ),
        z(F.sum((F.col("size") > 50).cast("long"))).alias("blocks_50_plus"),
        z(F.sum(F.expr("size * (size - 1) / 2"))).alias("candidate_pairs"),
    )


def reduction_ratio(keys: DataFrame, total_records: int) -> float:
    """A3: 1 - within-block pairs / all pairs (blocking_B1.py:119-127)."""
    row = (
        keys.groupBy("block_key")
        .agg(F.count("*").alias("s"))
        .agg(F.sum(F.expr("s * (s - 1) / 2")).alias("cand"))
        .collect()[0]
    )
    cand = float(row["cand"] or 0.0)
    total = total_records * (total_records - 1) / 2
    return 1.0 - cand / total if total > 0 else 0.0


def pairs_completeness(pairs: DataFrame, truth: DataFrame) -> float:
    """A4: fraction of true pairs surviving blocking
    (record_linkage.py:242-246). `truth` has (id_l, id_r) canonical."""
    total = truth.count()
    if total == 0:
        return 0.0
    surviving = truth.join(pairs, ["id_l", "id_r"], "leftsemi").count()
    return surviving / total
