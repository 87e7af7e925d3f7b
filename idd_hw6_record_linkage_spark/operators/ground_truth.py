"""VIN-based ground-truth construction (SURVEY §2.2 P3/P7, §2.4 J1/J2).

Reference: /root/reference/scripts/ground_truth/ground_truth.py —
filter both sources to valid VINs, inner-join on vin with _craig/_us
suffixes, keep matches coherent on (brand, year). The enrichment joins
mirror prep_ground_truth.py:20-31.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VIN_BLACKLIST = (
    "00000000000000000",
    "123456789ABCDEFGH",
    "XXXXXXXXXXXXXXXXX",
)


def is_valid_vin_expr(col: Column | str) -> Column:
    """P3 (ground_truth.py:19-32): exactly 17 chars after upper+strip,
    not blacklisted, not all-digit, not all-alpha. (The reference does
    NOT require alphanumeric-only — parity kept.)"""
    c = F.col(col) if isinstance(col, str) else col
    v = F.upper(F.trim(F.coalesce(c.cast("string"), F.lit("nan"))))
    return (
        (F.length(v) == 17)
        & ~v.isin(*VIN_BLACKLIST)
        & ~v.rlike(r"^[0-9]+$")
        & ~v.rlike(r"^[A-Za-z]+$")
    )


def vin_ground_truth(
    craig: DataFrame, us: DataFrame, compare_cols: list[str] | None = None
) -> DataFrame:
    """J1 + P7: inner equi-join on vin of VIN-valid rows, suffixed
    _craig/_us, filtered to brand/year coherence (ground_truth.py:36-49).
    Broadcast is NOT forced: both sides are large at web scale — AQE
    picks the strategy from runtime stats."""
    c = craig.where(is_valid_vin_expr("vin"))
    u = us.where(is_valid_vin_expr("vin"))
    shared = [col for col in c.columns if col != "vin" and col in u.columns]
    c = c.select(
        "vin", *[F.col(col).alias(f"{col}_craig") for col in shared]
    )
    u = u.select("vin", *[F.col(col).alias(f"{col}_us") for col in shared])
    joined = c.join(u, "vin", "inner")
    matches = joined.where(
        (F.col("brand_craig") == F.col("brand_us"))
        & (F.col("year_craig") == F.col("year_us"))
    )
    if compare_cols:
        keep = ["vin"] + [
            f"{col}_{side}" for col in compare_cols for side in ("craig", "us")
        ]
        matches = matches.select(*keep)
    return matches


def enrich_pairs(
    pairs: DataFrame, records: DataFrame, id_col: str, suffix: str
) -> DataFrame:
    """J2 (prep_ground_truth.py:20-31): point-lookup enrichment of a
    pair table with full record attributes for one side."""
    attrs = records.select(
        F.col(id_col).alias(f"source_id_{suffix}"),
        *[
            F.col(c).alias(f"{c}_{suffix}")
            for c in records.columns
            if c != id_col
        ],
    )
    return pairs.join(attrs, f"source_id_{suffix}", "inner")
