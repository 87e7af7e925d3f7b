"""Schema-mediation cleaners (SURVEY §2.3 F8-F17) as native Catalyst
expressions — the reference applies each with row-at-a-time
``Series.apply`` / ``df.apply(axis=1)``.

Reference citations (all /root/reference/scripts/allineamento_dataset/
align_dataset.py): clean_cylinders :97-107, clean_fuel :112-127,
clean_body :132-155, clean_trans :160-178, clean_drive :186-211,
derive_us_condition :219-237, craig condition map :240-244, lowercase
pass :256-259, VIN canonicalize :263-264, ZIP clean :29.

Null/NaN mimicry notes: pandas ``astype(str)`` turns NaN into the
literal string 'nan' — the reference keeps those; expressions here
reproduce that behavior exactly so outputs are value-identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FUEL_STD = {
    "gasoline": "gas",
    "gas": "gas",
    "diesel": "diesel",
    "hybrid": "hybrid",
    "electric": "electric",
    "other": "other",
}

BODY_MAP = {
    "pickup truck": "pickup",
    "pickup": "pickup",
    "sedan": "sedan",
    "coupe": "coupe",
    "suv / crossover": "suv",
    "suv": "suv",
    "hatchback": "hatchback",
    "mini-van": "van",
    "van": "van",
    "convertible": "convertible",
    "wagon": "wagon",
    "offroad": "other",
    "bus": "other",
}

TRANS_MAP = {"a": "automatic", "m": "manual", "cvt": "cvt"}

# Insertion order matters: substring search iterates keys in order
# (align_dataset.py:195-200).
DRIVE_MAP = {
    "all-wheel drive": "4wd",
    "four-wheel drive": "4wd",
    "front-wheel drive": "fwd",
    "rear-wheel drive": "rwd",
    "awd": "4wd",
    "4wd": "4wd",
    "fwd": "fwd",
    "rwd": "rwd",
    "4x4": "4wd",
}

CRAIG_COND_MAP = {
    "new": "new",
    "like new": "excellent",
    "excellent": "excellent",
    "good": "good",
    "fair": "fair",
    "salvage": "poor",
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _map_lookup(key: Column, mapping: dict[str, str]) -> Column:
    m = F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv])
    return m[key]


def clean_cylinders_expr(col: Column | str) -> Column:
    """F8: first digit run, else 'other'; NaN/'nan' → 'other'."""
    s = _c(col).cast("string")
    digits = F.regexp_extract(s, r"\d+", 0)
    return F.when(
        s.isNull() | (F.lower(s) == "nan"), F.lit("other")
    ).otherwise(F.coalesce(F.nullif(digits, F.lit("")), F.lit("other")))


def clean_fuel_expr(col: Column | str) -> Column:
    """F9: 6-entry map, default 'other'."""
    s = F.lower(F.trim(_c(col).cast("string")))
    return F.when(_c(col).isNull(), F.lit("other")).otherwise(
        F.coalesce(_map_lookup(s, FUEL_STD), F.lit("other"))
    )


def clean_body_expr(col: Column | str) -> Column:
    """F10: 13-entry map, default = cleaned passthrough."""
    s = F.lower(F.trim(_c(col).cast("string")))
    return F.when(_c(col).isNull(), F.lit("other")).otherwise(
        F.coalesce(_map_lookup(s, BODY_MAP), s)
    )


def clean_trans_expr(
    display: Column | str, code: Column | str | None = None, source: str = "us"
) -> Column:
    """F11: substring tests then code map (us) / substring only (craig).
    str(NaN) == 'nan' contains nothing relevant → falls through, as in
    the reference."""
    d = F.lower(F.coalesce(_c(display).cast("string"), F.lit("nan")))
    if source == "us":
        assert code is not None
        c = F.lower(F.coalesce(_c(code).cast("string"), F.lit("nan")))
        return (
            F.when(d.contains("automatic") | d.contains("auto"), F.lit("automatic"))
            .when(d.contains("manual"), F.lit("manual"))
            .otherwise(F.coalesce(_map_lookup(c, TRANS_MAP), F.lit("other")))
        )
    return (
        F.when(d.contains("auto"), F.lit("automatic"))
        .when(d.contains("man"), F.lit("manual"))
        .otherwise(F.lit("other"))
    )


def clean_drive_expr(
    display: Column | str, code: Column | str | None = None, source: str = "us"
) -> Column:
    """F12: ordered substring search over DRIVE_MAP keys, then code map
    (us) / exact map (craig), default 'other'."""
    if source == "us":
        assert code is not None
        d = F.lower(F.coalesce(_c(display).cast("string"), F.lit("nan")))
        c = F.lower(F.coalesce(_c(code).cast("string"), F.lit("nan")))
        expr = F.coalesce(_map_lookup(c, DRIVE_MAP), F.lit("other"))
        for key, val in reversed(DRIVE_MAP.items()):
            expr = F.when(d.contains(key), F.lit(val)).otherwise(expr)
        return expr
    v = F.lower(F.trim(F.coalesce(_c(display).cast("string"), F.lit("nan"))))
    return F.coalesce(_map_lookup(v, DRIVE_MAP), F.lit("other"))


def derive_us_condition_expr(
    is_new: Column | str, has_accidents: Column | str, mileage: Column | str
) -> Column:
    """F13: nested conditional over mileage bands; NULL mileage falls
    through every `<` (three-valued logic) exactly like NaN falls
    through every Python `<` — accidents→'fair', else→'poor'."""
    m = _c(mileage).try_cast("double")
    return (
        F.when(_c(is_new) == True, F.lit("new"))  # noqa: E712
        .when(
            _c(has_accidents) == True,  # noqa: E712
            F.when(m < 50000, F.lit("good")).otherwise(F.lit("fair")),
        )
        .when(m < 15000, F.lit("excellent"))
        .when(m < 60000, F.lit("good"))
        .when(m < 120000, F.lit("fair"))
        .otherwise(F.lit("poor"))
    )


def craig_condition_expr(col: Column | str) -> Column:
    """F14: 6-entry map + fillna('good')."""
    s = F.lower(_c(col).cast("string"))
    return F.coalesce(_map_lookup(s, CRAIG_COND_MAP), F.lit("good"))


def lower_strip_expr(col: Column | str) -> Column:
    """F15: astype(str).str.lower().str.strip() — NaN → 'nan'."""
    return F.lower(F.trim(F.coalesce(_c(col).cast("string"), F.lit("nan"))))


def vin_canonical_expr(col: Column | str) -> Column:
    """F16: upper + strip non-[A-Z0-9] — NaN → 'NAN'."""
    s = F.upper(F.coalesce(_c(col).cast("string"), F.lit("nan")))
    return F.trim(F.regexp_replace(s, r"[^A-Z0-9]", ""))


def zip_clean_expr(col: Column | str) -> Column:
    """F17: str(z).split('.')[0].zfill(5)[:5]."""
    s = F.split_part(_c(col).cast("string"), F.lit("."), F.lit(1))
    return F.substring(F.lpad(s, 5, "0"), 1, 5)
