"""MinHash-LSH banded blocking over 3-gram shingles (C8, SURVEY §2.6).

Not present in the reference (its blocking is key-equality only); the
north star mandates an LSH pass so near-duplicate texts that share no
exact key still become candidates. Implemented entirely with native
expressions — no Python on the hot path:

- shingles: word 3-grams of the cleaned text (``sequence`` +
  ``transform`` + ``element_at``), distinct;
- k minhashes: ``array_min(transform(shingles, s -> xxhash64(s, i)))``
  for i in 0..k-1 (xxhash64 with a literal seed column per hash fn);
- bands: ``num_bands`` groups of ``rows_per_band`` signature slots,
  each hashed to one block key, ``posexplode`` to (id, band_key) rows.

Two docs collide on a band iff their signatures agree on all rows of
that band — the standard (b, r) S-curve; defaults (b=8, r=4, k=32)
put the 50% collision point at Jaccard ≈ (1/8)^(1/4) ≈ 0.59.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-grams of a whitespace-tokenized string column."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.trim(c), r"\s+")
    cnt = F.size(toks) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(cnt, F.lit(1))),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )
    # shorter-than-n texts: fall back to the whitespace-normalized
    # token join as one shingle (NOT the raw string — short texts that
    # differ only in whitespace must still collide / verify equal).
    return F.when(cnt >= 1, F.array_distinct(grams)).otherwise(
        F.array(F.concat_ws(" ", toks))
    )


def minhash_signature(shingles: Column, num_hashes: int = 32) -> Column:
    """Array of num_hashes minhash values (xxhash64 seeded by index)."""
    sig = [
        F.array_min(F.transform(shingles, lambda s, i=i: F.xxhash64(s, F.lit(i))))
        for i in range(num_hashes)
    ]
    return F.array(*sig)


def band_keys(signature: Column, num_bands: int = 8, rows_per_band: int = 4) -> Column:
    """Array of num_bands band keys 'lsh{band}:{hash of band slice}'."""
    bands = []
    for b in range(num_bands):
        slots = [
            F.element_at(signature, b * rows_per_band + r + 1)
            for r in range(rows_per_band)
        ]
        bands.append(F.concat_ws(":", F.lit(f"lsh{b}"), F.xxhash64(*slots).cast("string")))
    return F.array(*bands)


def lsh_key_table(
    df: DataFrame,
    id_col: str = "url",
    text_col: str = "text_clean",
    shingle_n: int = 3,
    num_bands: int = 8,
    rows_per_band: int = 4,
    salt_basis: Column | None = None,
) -> DataFrame:
    """(id, block_key, pass='lsh') rows — one per (record, band).

    Feed into blocking.candidate_pairs_self / union_pairs like any
    other blocking pass; empty/short texts still emit a degenerate
    shingle so they can only collide with identical texts.
    """
    # Stage the shingle array as a real column: the k=bands*rows hash
    # transforms then reference one attribute instead of inlining the
    # shingle expression k times (which explodes codegen size —
    # CollapseProject keeps multi-referenced non-cheap aliases staged).
    shingled = df.select(
        F.col(id_col).alias("id"),
        word_shingles(text_col, shingle_n).alias("shingles"),
        *([] if salt_basis is None else [salt_basis.alias("salt_basis")]),
    )
    signed = shingled.select(
        "id",
        minhash_signature(F.col("shingles"), num_bands * rows_per_band).alias("sig"),
        *([] if salt_basis is None else ["salt_basis"]),
    )
    keys = signed.select(
        "id",
        F.explode(band_keys(F.col("sig"), num_bands, rows_per_band)).alias("block_key"),
        *([] if salt_basis is None else ["salt_basis"]),
    )
    return keys.withColumn("pass", F.lit("lsh"))
