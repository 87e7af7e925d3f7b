"""Key normalizers — native Catalyst expressions, no Python.

Each function mirrors a reference normalizer (SURVEY §2.3) but is a
pure column expression, so it runs inside whole-stage codegen and the
optimizer can push/prune around it.

Reference citations:
- normalize_brand: /root/reference/scripts/blocking/blocking_B1.py:22-48
- normalize_year:  /root/reference/scripts/blocking/blocking_B1.py:51-64
- normalize_string:/root/reference/scripts/blocking/blocking_B2.py:27-47
- get_model_prefix:/root/reference/scripts/blocking/blocking_B2.py:50-67
- B1 key:          /root/reference/scripts/blocking/blocking_B1.py:85-87
- B2 key:          /root/reference/scripts/blocking/blocking_B2.py:70-87
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 16-entry synonym map from blocking_B1.py:30-47. A chained-when (not a
# join) because the map is tiny and constant — Catalyst folds it.
BRAND_SYNONYMS: dict[str, str] = {
    "chevrolet": "chevrolet",
    "chevy": "chevrolet",
    "mercedes-benz": "mercedes-benz",
    "mercedes": "mercedes-benz",
    "mb": "mercedes-benz",
    "volkswagen": "volkswagen",
    "vw": "volkswagen",
    "bmw": "bmw",
    "land rover": "land rover",
    "landrover": "land rover",
    "alfa romeo": "alfa romeo",
    "alfa-romeo": "alfa romeo",
    "rolls-royce": "rolls-royce",
    "rolls royce": "rolls-royce",
    "aston martin": "aston martin",
    "aston-martin": "aston martin",
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_brand_expr(col: Column | str) -> Column:
    """lower+strip then synonym map, NaN→'unknown' (blocking_B1.py:22-48)."""
    base = F.lower(F.trim(_c(col).cast("string")))
    mapping = F.create_map(*[F.lit(x) for kv in BRAND_SYNONYMS.items() for x in kv])
    return F.when(_c(col).isNull(), F.lit("unknown")).otherwise(
        F.coalesce(mapping[base], base)
    )


def normalize_year_expr(col: Column | str) -> Column:
    """int(float(x)) validated to [1900, 2030] else NULL (blocking_B1.py:51-64)."""
    # try_cast: ANSI-safe analogue of the reference's try/except around
    # int(float(x)) — malformed input → NULL, not an error.
    y = _c(col).try_cast("double").try_cast("int")
    return F.when(y.between(1900, 2030), y)


def normalize_string_expr(col: Column | str) -> Column:
    """lower, strip, keep [a-z0-9], empty→NULL (blocking_B2.py:27-47)."""
    s = F.regexp_replace(F.lower(F.trim(_c(col).cast("string"))), r"[^a-z0-9]", "")
    return F.nullif(s, F.lit(""))


def model_prefix_expr(col: Column | str, length: int = 2) -> Column:
    """First `length` chars of the normalized model; shorter → whole
    string (blocking_B2.py:50-67). substring() naturally returns the
    whole string when it is shorter than `length`."""
    return F.substring(normalize_string_expr(col), 1, length)


def block_key_b1(brand: Column | str, year: Column | str) -> Column:
    """B1 key ``{brand_norm}_{year}``; NULL when brand is unknown or
    year invalid (blocking_B1.py:79-89 drops those rows)."""
    b = normalize_brand_expr(brand)
    y = normalize_year_expr(year)
    return F.when(
        b.isNotNull() & (b != "unknown") & y.isNotNull(),
        F.concat_ws("_", b, y.cast("string")),
    )


def block_key_b2(brand: Column | str, model: Column | str, length: int = 2) -> Column:
    """B2 key ``{brand_norm}_{model_prefix}``; NULL if either part
    missing (blocking_B2.py:70-87)."""
    b = normalize_string_expr(brand)
    p = model_prefix_expr(model, length)
    return F.when(b.isNotNull() & p.isNotNull(), F.concat_ws("_", b, p))


# --- Web-page graft key functions (SURVEY §1.3 role mapping) ---------------


def url_domain_expr(col: Column | str) -> Column:
    """Normalized registrable host of a URL → the coarse blocking key
    (role of `brand` in the reference). parse_url is a native expr."""
    host = F.lower(F.parse_url(_c(col), F.lit("HOST")))
    return F.regexp_replace(host, r"^www\.", "")


# Query params that never identify content (trackers); dropped by
# canonical_url_expr. Anchored; RE2-safe (no lookaround) so the SAME
# pattern runs in Spark (Java regex) and DuckDB (RE2) oracles.
TRACKING_PARAM_RE = r"^(utm_[a-z0-9]+|fbclid|gclid|msclkid|mc_[a-z]+|ref)="


def canonical_url_expr(col: Column | str) -> Column:
    """Canonical form of a web-page URL — the dedup identity key a
    Common-Crawl-scale pipeline needs before any content hashing
    (re-crawls of one page differ by tracking params / fragments /
    case / default ports, which would defeat exact url dedup):

    - scheme and host lowercased (path case preserved);
    - default port stripped (:80 for http, :443 for https);
    - fragment dropped;
    - tracking query params dropped (TRACKING_PARAM_RE);
    - surviving query params sorted (order-insensitive identity);
    - trailing slashes collapsed ('' path -> '/').

    Pure native exprs (regexp + array lambdas) — engine-parity regexes
    only, so a DuckDB oracle reproduces it token-for-token. Non-URL
    strings (no scheme://) fall through trimmed-unchanged."""
    u = F.trim(_c(col).cast("string"))
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    )
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )
    rest = F.regexp_extract(
        u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)", 1
    )
    path = F.regexp_replace(F.regexp_extract(rest, r"^([^?]*)", 1), r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"^[^?]*\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda x: (x != "") & ~x.rlike(TRACKING_PARAM_RE),
    )
    qnorm = F.array_join(F.array_sort(params), "&")
    out = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qnorm == "", F.lit("")).otherwise(F.concat(F.lit("?"), qnorm)),
    )
    return F.when(scheme == "", u).otherwise(out)


def title_tokens_expr(col: Column | str) -> Column:
    """Token-sorted normalized title words (role of `model`): lowercase,
    strip non-alnum per token, drop empties, sort — order-insensitive
    fine key. Native: split + transform + filter + sort_array."""
    toks = F.split(F.lower(F.trim(_c(col).cast("string"))), r"\s+")
    toks = F.transform(toks, lambda t: F.regexp_replace(t, r"[^a-z0-9]", ""))
    toks = F.filter(toks, lambda t: t != "")
    return F.sort_array(toks)
