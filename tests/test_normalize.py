"""Normalizer parity vs in-process restatements of the reference
functions (blocking_B1.py:22-64, blocking_B2.py:27-87)."""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.functions.normalize import (
    block_key_b1,
    block_key_b2,
    model_prefix_expr,
    normalize_brand_expr,
    normalize_string_expr,
    normalize_year_expr,
    title_tokens_expr,
    url_domain_expr,
)
from idd_hw6_record_linkage_spark.functions.normalize import BRAND_SYNONYMS


# --- reference restatements (blocking_B1.py / blocking_B2.py) --------------

def ref_normalize_brand(brand):
    if brand is None or (isinstance(brand, float) and pd.isna(brand)):
        return "unknown"
    brand = str(brand).lower().strip()
    return BRAND_SYNONYMS.get(brand, brand)


def ref_normalize_year(year):
    if year is None or (isinstance(year, float) and pd.isna(year)):
        return None
    try:
        year = int(float(year))
        if 1900 <= year <= 2030:
            return year
    except (ValueError, TypeError):
        pass
    return None


def ref_normalize_string(s):
    if s is None:
        return None
    s = str(s).lower().strip()
    s = re.sub(r"[^a-z0-9]", "", s)
    return s if s else None


def ref_model_prefix(model, length=2):
    n = ref_normalize_string(model)
    if n is None or len(n) < length:
        return n
    return n[:length]


def ref_key_b2(brand, model):
    b = ref_normalize_string(brand)
    p = ref_model_prefix(model)
    if b is None or p is None:
        return None
    return f"{b}_{p}"


BRANDS = [None, "Chevy", " vw ", "BMW", "landrover", "Alfa-Romeo", "  Ford ",
          "MERCEDES", "mb", "rolls royce", "exotic brand", ""]
YEARS = [None, 2015, "2015", 2015.0, "2015.7", 1899, 2031, 1900, 2030,
         "notayear", -5, "1985.0"]
STRINGS = [None, "", "  ", "Mazda CX-5!", "a", "Ab", "ÉÉÉ", "F-150 XLT", "911"]


def test_normalize_brand(spark):
    df = spark.createDataFrame([(i, b) for i, b in enumerate(BRANDS)],
                               "i int, brand string")
    got = {r["i"]: r["b"] for r in
           df.select("i", normalize_brand_expr("brand").alias("b")).collect()}
    for i, b in enumerate(BRANDS):
        assert got[i] == ref_normalize_brand(b), f"brand {b!r}"


def test_normalize_year(spark):
    df = spark.createDataFrame([(i, str(y) if y is not None else None)
                                for i, y in enumerate(YEARS)], "i int, year string")
    got = {r["i"]: r["y"] for r in
           df.select("i", normalize_year_expr("year").alias("y")).collect()}
    for i, y in enumerate(YEARS):
        assert got[i] == ref_normalize_year(str(y) if y is not None else None), f"year {y!r}"


def test_normalize_string_and_prefix(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(STRINGS)],
                               "i int, s string")
    got = df.select(
        "i",
        normalize_string_expr("s").alias("ns"),
        model_prefix_expr("s").alias("pf"),
    ).collect()
    for r in got:
        s = STRINGS[r["i"]]
        assert r["ns"] == ref_normalize_string(s), f"norm {s!r}"
        assert r["pf"] == ref_model_prefix(s), f"prefix {s!r}"


def test_block_keys(spark):
    rows = [(i, b, str(y) if y is not None else None, m)
            for i, (b, y, m) in enumerate(
                [("Chevy", 2015, "Silverado"), (None, 2015, "x"),
                 ("vw", None, "Golf GTI"), ("Ford", 1899, "F-150"),
                 ("bmw", 2020, "M"), ("kia", 2010, "")])]
    df = spark.createDataFrame(rows, "i int, brand string, year string, model string")
    got = df.select(
        "i",
        block_key_b1("brand", "year").alias("k1"),
        block_key_b2("brand", "model").alias("k2"),
    ).collect()
    for r in got:
        _, b, y, m = rows[r["i"]]
        nb, ny = ref_normalize_brand(b), ref_normalize_year(y)
        exp1 = f"{nb}_{ny}" if (nb and nb != "unknown" and ny) else None
        assert r["k1"] == exp1, f"B1 {b!r},{y!r}"
        assert r["k2"] == ref_key_b2(b, m), f"B2 {b!r},{m!r}"


def test_url_domain_and_title_tokens(spark):
    df = spark.createDataFrame(
        [
            (0, "https://www.Example.COM/path?q=1", "The Quick! Brown-Fox"),
            (1, "http://sub.site.org/x", "  zebra Apple  "),
            (2, "https://site00001.example.com/e0000000001/m0", ""),
        ],
        "i int, url string, title string",
    )
    got = df.select(
        "i",
        url_domain_expr("url").alias("d"),
        F.concat_ws(" ", title_tokens_expr("title")).alias("t"),
    ).collect()
    res = {r["i"]: (r["d"], r["t"]) for r in got}
    assert res[0] == ("example.com", "brownfox quick the")
    assert res[1] == ("sub.site.org", "apple zebra")
    assert res[2][0] == "site00001.example.com"
    assert res[2][1] == ""


def test_canonical_url_expr(spark):
    from idd_hw6_record_linkage_spark.functions.normalize import (
        canonical_url_expr,
    )

    cases = [
        # scheme/host case + default port + fragment + tracking params
        (0, "HTTP://WWW.Example.COM:80/Path/One?utm_source=x&b=2&a=1#frag",
         "http://www.example.com/Path/One?a=1&b=2"),
        (1, "https://Site.org:443/a///", "https://site.org/a"),
        # non-default port preserved; https :80 NOT stripped
        (2, "http://h.io:8080/x", "http://h.io:8080/x"),
        (3, "https://h.io:80/x", "https://h.io:80/x"),
        # all-tracking query drops the '?'; empty path -> '/'
        (4, "https://h.io?fbclid=A&gclid=B", "https://h.io/"),
        # path case preserved, param sort is lexical
        (5, "http://H.io/KeepCase?z=1&y=2", "http://h.io/KeepCase?y=2&z=1"),
        # non-URL fall-through, trimmed
        (6, "  not a url  ", "not a url"),
        (7, None, None),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u, _ in cases], "i int, url string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select(
            "i", canonical_url_expr("url").alias("c")
        ).collect()
    }
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)
