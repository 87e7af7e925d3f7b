"""Mediated-schema alignment (SURVEY §3.3 upstream chain, P1/P2).

Reference: /root/reference/scripts/allineamento_dataset/align_dataset.py
— two source schemas are projected/renamed into one mediated schema
via column-mapping dicts (:40-92), then each field is cleaned with the
F8-F17 functions. Here the whole alignment is ONE select per source
(column pruning reaches the scan; every cleaner is a native expr).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.functions import align as A

# Mediated schema columns (align_dataset.py:40-88 targets, SURVEY §1.3).
MEDIATED_COLUMNS = [
    "vin", "brand", "model", "year", "price", "mileage", "latitude",
    "longitude", "color", "ad_date", "description", "source_id",
    "cylinders", "body_type", "transmission", "fuel_type", "condition",
    "drive", "city_region", "state", "source",
]

_STRING_PASS_COLS = ["brand", "model", "color", "description", "city_region", "state"]


def align_source(
    df: DataFrame,
    column_mapping: dict[str, str],
    source_name: str,
    trans_code_col: str | None = None,
    drive_code_col: str | None = None,
    is_new_col: str | None = None,
    has_accidents_col: str | None = None,
    condition_col: str | None = None,
) -> DataFrame:
    """Project + rename via the mapping dict (P1, align_dataset.py:91-92),
    then apply every cleaner. Support columns (trans/drive codes,
    is_new/has_accidents) are consumed here and dropped (P2)."""
    source_kind = "us" if trans_code_col is not None else "craig"
    out = df.select(
        *[F.col(src).alias(dst) for src, dst in column_mapping.items()],
        *([F.col(trans_code_col).alias("__trans_code")] if trans_code_col else []),
        *([F.col(drive_code_col).alias("__drive_code")] if drive_code_col else []),
        *([F.col(is_new_col).alias("__is_new")] if is_new_col else []),
        *(
            [F.col(has_accidents_col).alias("__has_accidents")]
            if has_accidents_col
            else []
        ),
    )
    out = out.withColumn("cylinders", A.clean_cylinders_expr("cylinders"))
    out = out.withColumn("fuel_type", A.clean_fuel_expr("fuel_type"))
    out = out.withColumn("body_type", A.clean_body_expr("body_type"))
    if source_kind == "us":
        out = out.withColumn(
            "transmission",
            A.clean_trans_expr("transmission", "__trans_code", "us"),
        ).withColumn("drive", A.clean_drive_expr("drive", "__drive_code", "us"))
        out = out.withColumn(
            "condition",
            A.derive_us_condition_expr("__is_new", "__has_accidents", "mileage"),
        )
    else:
        out = out.withColumn(
            "transmission", A.clean_trans_expr("transmission", source="craig")
        ).withColumn("drive", A.clean_drive_expr("drive", source="craig"))
        out = out.withColumn(
            "condition", A.craig_condition_expr(condition_col or "condition")
        )
    out = out.withColumn("source", F.lit(source_name))
    for c in _STRING_PASS_COLS:
        out = out.withColumn(c, A.lower_strip_expr(c))
    out = out.withColumn("vin", A.vin_canonical_expr("vin"))
    return out.drop("__trans_code", "__drive_code", "__is_new", "__has_accidents")


def zip_state_enrich(df: DataFrame, zip_state: DataFrame,
                     zip_col: str = "zip") -> DataFrame:
    """J6/S7: enrich with state via a broadcast lookup join — the
    reference memoizes a SQLite lookup over distinct zips
    (align_dataset.py:10-35); distinct+broadcast is the Spark shape."""
    lut = zip_state.select(
        A.zip_clean_expr("zip").alias("__zip"), F.col("state").alias("__state")
    ).dropDuplicates(["__zip"])
    return (
        df.withColumn("__zip", A.zip_clean_expr(zip_col))
        .join(F.broadcast(lut), "__zip", "left")
        .withColumn("state", F.coalesce("state", "__state"))
        .drop("__zip", "__state")
    )
