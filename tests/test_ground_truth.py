"""VIN ground-truth construction parity (ground_truth.py:19-49) and the
alignment operator end-to-end over a mediated-record fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.operators.alignment import align_source
from idd_hw6_record_linkage_spark.operators.ground_truth import (
    enrich_pairs,
    is_valid_vin_expr,
    vin_ground_truth,
)


def ref_is_valid_vin(vin):
    vin = str(vin if vin is not None else float("nan")).upper().strip()
    if len(vin) != 17:
        return False
    blacklist = ["00000000000000000", "123456789ABCDEFGH", "XXXXXXXXXXXXXXXXX"]
    if vin in blacklist or vin.isnumeric() or vin.isalpha():
        return False
    return True


VINS = [
    None, "", "1HGCM82633A004352", "00000000000000000", "123456789ABCDEFGH",
    "XXXXXXXXXXXXXXXXX", "12345678901234567", "ABCDEFGHIJKLMNOPQ",
    "1hgcm82633a004352", "1HGCM82633A00435", "1HGCM82633A0043522",
]


def test_is_valid_vin(spark):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(VINS)], "i int, v string")
    got = {r["i"]: r["ok"] for r in df.select("i", is_valid_vin_expr("v").alias("ok")).collect()}
    for i, v in enumerate(VINS):
        assert got[i] == ref_is_valid_vin(v), v


def test_vin_ground_truth_join(spark):
    craig = spark.createDataFrame(
        [
            ("1HGCM82633A004352", "honda", 2003, "c1"),
            ("2HGCM82633A004353", "toyota", 2010, "c2"),
            ("3HGCM82633A004354", "ford", 2015, "c3"),
            ("badvin", "kia", 2012, "c4"),
        ],
        "vin string, brand string, year int, source_id string",
    )
    us = spark.createDataFrame(
        [
            ("1HGCM82633A004352", "honda", 2003, "u1"),   # coherent match
            ("2HGCM82633A004353", "toyota", 2011, "u2"),  # year mismatch
            ("3HGCM82633A004354", "chevy", 2015, "u3"),   # brand mismatch
        ],
        "vin string, brand string, year int, source_id string",
    )
    gt = vin_ground_truth(craig, us)
    rows = gt.collect()
    assert len(rows) == 1
    assert rows[0]["vin"] == "1HGCM82633A004352"
    assert rows[0]["source_id_craig"] == "c1" and rows[0]["source_id_us"] == "u1"

    # J2 enrichment: point lookups back to the full records
    pairs = gt.select("source_id_craig", "source_id_us")
    enriched = enrich_pairs(pairs, craig, "source_id", "craig")
    assert "brand_craig" in enriched.columns
    assert enriched.count() == 1


def test_align_source_end_to_end(spark):
    us_raw = spark.createDataFrame(
        [
            ("1hgcm82633a-004352", "Chevy", "Silverado 1500", 2015, 25000.0,
             12000.0, "Red", "Great TRUCK!", "Dallas", "TX", "u1",
             "6 cyl", "Pickup Truck", "8-Speed Automatic", "a", "Gasoline",
             "Four-Wheel Drive", "4wd", False, False),
            (None, None, None, None, None, None, None, None, None, None, "u2",
             None, None, None, None, None, None, None, None, True),
        ],
        "vin string, brand string, model string, year int, price double, "
        "mileage double, color string, description string, city_region string, "
        "state string, source_id string, cylinders string, body_type string, "
        "transmission string, trans_code string, fuel_type string, "
        "drive string, drive_code string, is_new boolean, has_accidents boolean",
    )
    mapping = {c: c for c in [
        "vin", "brand", "model", "year", "price", "mileage", "color",
        "description", "city_region", "state", "source_id", "cylinders",
        "body_type", "transmission", "fuel_type", "drive",
    ]}
    aligned = align_source(
        us_raw, mapping, "us_used_cars",
        trans_code_col="trans_code", drive_code_col="drive_code",
        is_new_col="is_new", has_accidents_col="has_accidents",
    )
    rows = {r["source_id"]: r for r in aligned.collect()}
    r1 = rows["u1"]
    assert r1["vin"] == "1HGCM82633A004352"
    assert r1["brand"] == "chevy"  # F15 lower-strip (synonyms are a blocking concern)
    assert r1["cylinders"] == "6"
    assert r1["body_type"] == "pickup"
    assert r1["transmission"] == "automatic"
    assert r1["fuel_type"] == "gas"
    assert r1["drive"] == "4wd"
    assert r1["condition"] == "excellent"  # no accidents, mileage < 15k
    assert r1["source"] == "us_used_cars"
    r2 = rows["u2"]
    assert r2["vin"] == "NAN" and r2["brand"] == "nan"
    assert r2["cylinders"] == "other" and r2["fuel_type"] == "other"
    # has_accidents=True, mileage NULL → NULL<50000 falls through → 'fair'
    assert r2["condition"] == "fair"


def test_align_condition_null_mileage_accident(spark):
    df = spark.createDataFrame(
        [(True, None), (False, None)], "acc boolean, m double"
    )
    from idd_hw6_record_linkage_spark.functions.align import derive_us_condition_expr

    got = df.select(
        derive_us_condition_expr(F.lit(False), "acc", "m").alias("c")
    ).collect()
    assert [r["c"] for r in got] == ["fair", "poor"]
