"""Streaming per-domain sessionization: the native session_window op
and the custom applyInPandasWithState variant (streaming/sessions.py).

Watermark mechanics drive the file layout: the watermark used by
trigger N is computed from trigger N-1's data, so sessions close two
triggers after the event that should flush them — hence three files
with maxFilesPerTrigger=1 (pages → sentinel advancing event time →
second sentinel running with the advanced watermark)."""

from __future__ import annotations

import datetime as dt
import time

from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.streaming import ingest, sessions

T = dt.datetime
_PAGES_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def _page(domain, ts, path="p"):
    return (f"https://{domain}/{path}", ts, b"<title>t</title>", "body", "en")


def _write_sequenced_source(spark, src):
    batches = [
        [  # trigger 1: the sessions under test
            _page("a.com", T(2024, 1, 1, 10, 0), "p1"),
            _page("a.com", T(2024, 1, 1, 10, 5), "p2"),
            _page("b.com", T(2024, 1, 1, 10, 0), "p1"),
            _page("d.com", T(2024, 1, 1, 10, 0), "p1"),
            _page("d.com", T(2024, 1, 1, 10, 1), "p2"),
            _page("d.com", T(2024, 1, 1, 10, 2), "p3"),
            _page("d.com", T(2024, 1, 1, 10, 3), "p4"),
            _page("d.com", T(2024, 1, 1, 10, 4), "p5"),
        ],
        # trigger 2: sentinel advancing max event time to 13:00
        [_page("z.com", T(2024, 1, 1, 13, 0), "s1")],
        # trigger 3: runs with watermark 12:00 -> flush a/b/d
        [_page("z.com", T(2024, 1, 1, 13, 1), "s2")],
    ]
    for rows in batches:
        # coalesce(1): one file per append — a multi-row batch split
        # across part files shares an mtime, and the file source's
        # tie-break can deliver the LATER event first, advancing the
        # watermark past the earlier one (dropped pre-operator)
        spark.createDataFrame(rows, _PAGES_DDL).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)  # distinct mtimes => stable trigger order


def _drain(stream_df, out, ckpt):
    q = ingest.run_to_parquet(stream_df, out, ckpt)
    # assert, don't assume: under ambient load a slow trigger past the
    # timeout would otherwise surface as a confusing missing-rows
    # assertion downstream
    assert q.awaitTermination(300), "streaming drain did not finish"


def test_native_session_window_sessions(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_sequenced_source(spark, src)
    stream = ingest.read_pages_stream(spark, src, max_files_per_trigger=1)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(
        sessions.domain_sessions(stream, gap="30 minutes", watermark="1 hour"),
        out,
        ckpt,
    )
    got = {
        r["domain"]: r
        for r in spark.read.parquet(out).collect()
        if r["domain"] != "z.com"
    }
    assert set(got) == {"a.com", "b.com", "d.com"}
    a = got["a.com"]
    assert a["n_pages"] == 2
    assert a["session_start"] == T(2024, 1, 1, 10, 0)
    assert a["session_end"] == T(2024, 1, 1, 10, 35)  # last + gap
    assert got["b.com"]["n_pages"] == 1
    assert got["d.com"]["n_pages"] == 5


def test_stateful_sessions_timeout_and_cap(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_sequenced_source(spark, src)
    stream = ingest.read_pages_stream(spark, src, max_files_per_trigger=1)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(
        sessions.domain_sessions_stateful(
            stream, gap_seconds=1800, max_pages=3, watermark="1 hour"
        ),
        out,
        ckpt,
    )
    rows = spark.read.parquet(out).collect()
    got = {r["domain"]: r for r in rows}
    # z.com's own session never closes (no later watermark) — absent
    assert set(got) == {"a.com", "b.com", "d.com"}
    a = got["a.com"]
    assert a["n_pages"] == 2 and not a["capped"]
    assert a["session_start"] == T(2024, 1, 1, 10, 0)
    assert a["session_end"] == T(2024, 1, 1, 10, 5)  # LAST PAGE, not +gap
    assert got["b.com"]["n_pages"] == 1 and not got["b.com"]["capped"]
    d = got["d.com"]
    assert d["n_pages"] == 5 and d["capped"]  # crawler-trap flag


def test_stateful_sessions_split_on_gap_within_stream(spark, tmp_path):
    """Two bursts of the same domain separated by > gap inside the
    data itself (not via timeout): the first closes when the second
    arrives, in-stream."""
    src = str(tmp_path / "src")
    batches = [
        [
            _page("a.com", T(2024, 1, 1, 10, 0), "p1"),
            _page("a.com", T(2024, 1, 1, 12, 0), "p2"),  # > 30 min gap
        ],
        [_page("z.com", T(2024, 1, 1, 15, 0), "s1")],
        [_page("z.com", T(2024, 1, 1, 15, 1), "s2")],
    ]
    for rows in batches:
        # coalesce(1): see _write_sequenced_source — without it the
        # two-row batch can split into same-mtime part files and the
        # 12:00 page can beat the 10:00 page through the watermark
        spark.createDataFrame(rows, _PAGES_DDL).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)
    stream = ingest.read_pages_stream(spark, src, max_files_per_trigger=1)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(
        sessions.domain_sessions_stateful(
            stream, gap_seconds=1800, max_pages=100, watermark="1 hour"
        ),
        out,
        ckpt,
    )
    a_rows = sorted(
        (
            r
            for r in spark.read.parquet(out).collect()
            if r["domain"] == "a.com"
        ),
        key=lambda r: r["session_start"],
    )
    assert len(a_rows) == 2
    assert a_rows[0]["session_start"] == T(2024, 1, 1, 10, 0)
    assert a_rows[0]["session_end"] == T(2024, 1, 1, 10, 0)
    assert a_rows[1]["session_start"] == T(2024, 1, 1, 12, 0)
    assert all(r["n_pages"] == 1 for r in a_rows)


def test_stateful_sessions_reverse_arrival_order(spark, tmp_path):
    """Regression: the 12:00 page delivered in a trigger BEFORE the
    10:00 page (file mtime ties under load can swap delivery order —
    the exact condition that once glued both pages into one session
    stamped (12:00, 12:00, n=2)). The pre-start guard must surface the
    10:00 page as its own older session instead of absorbing it."""
    src = str(tmp_path / "src")
    batches = [
        # coalesce(1): exactly ONE file per append, so file order ==
        # append order and the reversal is deterministic, not luck.
        [_page("a.com", T(2024, 1, 1, 12, 0), "p2")],
        [_page("a.com", T(2024, 1, 1, 10, 0), "p1")],  # late, reversed
        [_page("z.com", T(2024, 1, 1, 15, 0), "s1")],
        [_page("z.com", T(2024, 1, 1, 15, 1), "s2")],
    ]
    for rows in batches:
        spark.createDataFrame(rows, _PAGES_DDL).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)
    stream = ingest.read_pages_stream(spark, src, max_files_per_trigger=1)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(
        sessions.domain_sessions_stateful(
            stream, gap_seconds=1800, max_pages=100, watermark="1 hour"
        ),
        out,
        ckpt,
    )
    a_rows = sorted(
        (
            r
            for r in spark.read.parquet(out).collect()
            if r["domain"] == "a.com"
        ),
        key=lambda r: r["session_start"],
    )
    assert [(r["session_start"], r["session_end"], r["n_pages"])
            for r in a_rows] == [
        (T(2024, 1, 1, 10, 0), T(2024, 1, 1, 10, 0), 1),
        (T(2024, 1, 1, 12, 0), T(2024, 1, 1, 12, 0), 1),
    ]


def test_stateful_sessions_early_arrival_extends_open_session(spark, tmp_path):
    """An out-of-order event within gap BEFORE the open session's start
    extends it downward (start moves earlier) rather than forward."""
    src = str(tmp_path / "src")
    batches = [
        [_page("a.com", T(2024, 1, 1, 10, 20), "p2")],
        [_page("a.com", T(2024, 1, 1, 10, 0), "p1")],  # within gap, early
        [_page("z.com", T(2024, 1, 1, 13, 0), "s1")],
        [_page("z.com", T(2024, 1, 1, 13, 1), "s2")],
    ]
    for rows in batches:
        spark.createDataFrame(rows, _PAGES_DDL).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)
    stream = ingest.read_pages_stream(spark, src, max_files_per_trigger=1)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(
        sessions.domain_sessions_stateful(
            stream, gap_seconds=1800, max_pages=100, watermark="1 hour"
        ),
        out,
        ckpt,
    )
    a_rows = [
        r
        for r in spark.read.parquet(out).collect()
        if r["domain"] == "a.com"
    ]
    assert [(r["session_start"], r["session_end"], r["n_pages"])
            for r in a_rows] == [
        (T(2024, 1, 1, 10, 0), T(2024, 1, 1, 10, 20), 2),
    ]
