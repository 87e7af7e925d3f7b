"""Line-level boilerplate dedup (operators.line_dedup) and PII
redaction (functions.pii) unit tests: semantics on hand-built corpora
where the expected output is computable by eye."""

from __future__ import annotations

from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.functions import pii
from idd_hw6_record_linkage_spark.operators import line_dedup


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "id long, text string")


BOILER = "accept cookies"
DOCS = [
    (1, f"{BOILER}\nunique one\nfooter inc"),
    (2, f"{BOILER}\nunique two\nfooter inc"),
    (3, f"{BOILER}\nunique three"),
    (4, "no banner here\nunique four"),
]


def test_remove_boilerplate_lines_strips_frequent_keeps_order(spark):
    out = {
        r["id"]: r
        for r in line_dedup.remove_boilerplate_lines(
            _corpus(spark, DOCS), "id", "text", min_docs=2
        ).collect()
    }
    # BOILER in 3 docs, "footer inc" in 2 — both stripped at min_docs=2
    assert out[1]["clean_text"] == "unique one"
    assert out[2]["clean_text"] == "unique two"
    assert out[3]["clean_text"] == "unique three"
    assert out[4]["clean_text"] == "no banner here\nunique four"
    assert out[1]["n_lines"] == 3 and out[1]["n_removed"] == 2
    assert out[4]["n_removed"] == 0


def test_remove_boilerplate_min_docs_boundary(spark):
    out = {
        r["id"]: r["clean_text"]
        for r in line_dedup.remove_boilerplate_lines(
            _corpus(spark, DOCS), "id", "text", min_docs=3
        ).collect()
    }
    # only BOILER reaches doc_freq 3; "footer inc" (2 docs) survives
    assert out[1] == "unique one\nfooter inc"
    assert out[2] == "unique two\nfooter inc"


def test_remove_boilerplate_trim_and_blank_semantics(spark):
    docs = [
        (1, "  spam  \nreal content\n"),
        (2, "spam\nother content"),
        (3, "spam \nthird content"),
    ]
    out = {
        r["id"]: r
        for r in line_dedup.remove_boilerplate_lines(
            _corpus(spark, docs), "id", "text", min_docs=2
        ).collect()
    }
    # lines are keyed on trim(line): '  spam  ' == 'spam' == 'spam '
    assert out[1]["clean_text"] == "real content\n"  # trailing blank kept
    assert out[1]["n_lines"] == 3  # ['  spam  ', 'real content', '']
    assert out[2]["clean_text"] == "other content"
    assert out[3]["clean_text"] == "third content"


def test_remove_boilerplate_null_text_retained(spark):
    # NULL text must NOT vanish (split(NULL) explodes to zero rows
    # without the coalesce): kept as one empty line, nothing removed.
    docs = [(1, None), (2, "a\nb"), (3, "a\nc")]
    out = {
        r["id"]: r
        for r in line_dedup.remove_boilerplate_lines(
            _corpus(spark, docs), "id", "text", min_docs=2
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1]["n_lines"] == 1
    assert out[1]["n_removed"] == 0
    assert out[1]["clean_text"] == ""
    assert out[2]["clean_text"] == "b"  # 'a' is boilerplate (2 docs)


def test_md5_60_and_xxhash64_bases_agree_on_decisions(spark):
    df = _corpus(spark, DOCS)
    a = {
        (r["id"], r["clean_text"])
        for r in line_dedup.remove_boilerplate_lines(
            df, "id", "text", min_docs=2, base="xxhash64"
        ).collect()
    }
    b = {
        (r["id"], r["clean_text"])
        for r in line_dedup.remove_boilerplate_lines(
            df, "id", "text", min_docs=2, base="md5_60"
        ).collect()
    }
    assert a == b


def _redact_one(spark, text):
    df = spark.createDataFrame([(text,)], "t string")
    row = df.select(
        pii.redact_pii_expr("t").alias("r"),
        *[c.alias(n) for n, c in pii.pii_counts_exprs("t").items()],
    ).collect()[0]
    return row


def test_pii_email_ip_phone(spark):
    r = _redact_one(
        spark,
        "mail a.b-c%d@sub.example.co.uk or 192.168.0.1 call +1 555 019 0234 ok",
    )
    assert r["r"] == "mail <EMAIL> or <IP> call <PHONE> ok"
    assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (1, 1, 1)


def test_pii_short_numbers_and_years_survive(spark):
    r = _redact_one(spark, "in 2024 we sold 1500 units at 19.99 each")
    assert r["r"] == "in 2024 we sold 1500 units at 19.99 each"
    assert (r["n_emails"], r["n_ips"], r["n_phones"]) == (0, 0, 0)


def test_pii_ip_not_eaten_by_phone_rule(spark):
    # dotted quad must become <IP>, not a partial <PHONE>
    r = _redact_one(spark, "host 10.20.30.40 port 8080")
    assert r["r"] == "host <IP> port 8080"


def test_pii_email_with_digits_counted_once(spark):
    r = _redact_one(spark, "user1234567890@example.com wrote")
    assert r["r"] == "<EMAIL> wrote"
    assert (r["n_emails"], r["n_phones"]) == (1, 0)


def test_pii_null_passthrough(spark):
    df = spark.createDataFrame([(None,)], "t string")
    row = df.select(pii.redact_pii_expr("t").alias("r")).collect()[0]
    assert row["r"] is None


ADVERSARIAL = [
    "plain text with no pii at all",
    "a@b.co",                              # minimal email
    "x@y.c",                               # TLD too short — not an email
    "first.last+tag%ok@sub-domain.example.museum done",
    "trailing dot a@b.com.",               # dot after TLD
    "999.999.999.999 syntactic quad",      # still redacted (no range check)
    "1.2.3.4",                             # bare IP
    "1.2.3.4.5 five octets",
    "v1.2.3.4000 version-like",
    "12345678 eight digits stays",
    "123456789 nine digits goes",
    "+49 170 123 4567 de mobile",
    "555-019-0123-77 dashed run",
    "price 1,234,567.89 commas block the run",
    "a1@b2.com then 10.0.0.1 then +1 555 019 0234",
    "email.with.dots.everywhere@x.io",
    "UPPER@CASE.COM shouted",
    "tok 192.168.1.1: colon after ip",
    "(555) 123 4567 paren prefix",         # paren not in pattern
    "ends with digits 987654321",
    "unicode café résumé naïve no digits",
    "tab\tseparated\t5551234567 not long enough? 10 digits goes",
    "",
]


def test_pii_redaction_engine_parity_adversarial(spark):
    """The Java-regex (Spark) and RE2 (DuckDB) redaction chains agree
    character-for-character on an adversarial corpus — the contract
    oracle's parity claim, tested off the happy path."""
    import duckdb

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(ADVERSARIAL)], "id long, t string"
    )
    got = {
        r["id"]: r["r"]
        for r in df.select("id", pii.redact_pii_expr("t").alias("r")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE s (id BIGINT, t VARCHAR)")
    con.executemany(
        "INSERT INTO s VALUES (?, ?)", list(enumerate(ADVERSARIAL))
    )
    sql = f"""
      SELECT id, regexp_replace(regexp_replace(regexp_replace(t,
        '{pii.EMAIL_RE}', '<EMAIL>', 'g'),
        '{pii.IPV4_RE}', '<IP>', 'g'),
        '{pii.PHONE_RE}', '<PHONE>', 'g') AS r FROM s
    """
    want = {int(i): r for i, r in con.execute(sql).fetchall()}
    assert got == want
    # spot-check intent, not just parity
    assert want[1] == "<EMAIL>"
    assert want[2] == "x@y.c"
    assert want[6] == "<IP>"
    assert want[9] == "12345678 eight digits stays"
    assert want[10] == "<PHONE> nine digits goes"


def test_remove_boilerplate_no_broadcast_same_answer(spark):
    """broadcast_boiler=False (shuffled hash join escape hatch for a
    huge boilerplate set) gives the identical result."""
    df = _corpus(spark, DOCS)
    a = sorted(
        map(
            tuple,
            line_dedup.remove_boilerplate_lines(
                df, "id", "text", min_docs=2
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            line_dedup.remove_boilerplate_lines(
                df, "id", "text", min_docs=2, broadcast_boiler=False
            ).collect(),
        )
    )
    assert a == b


def test_md5_60_line_key_unicode_parity_with_duckdb(spark):
    """The md5_60 line-key basis must agree with DuckDB's
    ('0x' || substr(md5(x),1,15))::BIGINT on non-ASCII text — both
    engines hash the UTF-8 bytes, so emoji/CJK/combining marks and
    the empty string all map identically."""
    import duckdb

    strings = [
        "plain ascii line",
        "café résumé naïve",
        "日本語のテキスト行",
        "emoji 🙂🚀 line",
        "combining á mark",
        "ß spätzle ÆØÅ",
        "",
    ]
    df = spark.createDataFrame([(s,) for s in strings], "t string")
    got = {
        r["t"]: r["k"]
        for r in df.select(
            "t", line_dedup._line_key(F.col("t"), "md5_60").alias("k")
        ).collect()
    }
    con = duckdb.connect()
    for s in strings:
        want = con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT", [s]
        ).fetchone()[0]
        assert got[s] == want, s
