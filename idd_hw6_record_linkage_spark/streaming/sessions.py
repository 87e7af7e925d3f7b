"""Streaming per-domain crawl sessionization — two implementations:

- ``domain_sessions``: the NATIVE path (``F.session_window`` gap
  windows + watermark). Always prefer this: state is managed by the
  engine, merges across triggers, and scales like any windowed agg.
- ``domain_sessions_stateful``: the same sessions via
  ``applyInPandasWithState`` — the engine's demonstration of a CUSTOM
  stateful operator for logic ``session_window`` cannot express; here
  the extra semantics is a crawler-trap flag (``capped``) raised when
  a single session exceeds ``max_pages``. Per-key state is a fixed
  4-field tuple (bounded regardless of session length), closed either
  by a gap (next page starts a new session) or by event-time timeout
  when the watermark passes last_seen + gap.

The reference has no streaming (SURVEY §2.9); this extends the
streaming extension to stateful session analytics over the crawl
(burst detection, trap domains, politeness auditing).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from idd_hw6_record_linkage_spark.functions.normalize import url_domain_expr

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

__all__ = ["domain_sessions", "domain_sessions_stateful"]

SESSION_SCHEMA = (
    "domain string, session_start timestamp, session_end timestamp, "
    "n_pages long, capped boolean"
)
_STATE_SCHEMA = "start long, last long, n long, capped boolean"


def domain_sessions(
    pages_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based crawl sessions per registered domain, natively:
    one row per closed session (append mode — a session emits once
    the watermark passes its end). ``session_end`` is the native
    session_window end = last page + gap."""
    return (
        pages_stream.withColumn("domain", url_domain_expr("url"))
        .withWatermark("warc_ts", watermark)
        .groupBy("domain", F.session_window("warc_ts", gap))
        .agg(F.count("*").cast("long").alias("n_pages"))
        .select(
            "domain",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_pages",
        )
    )


def domain_sessions_stateful(
    pages_stream: DataFrame,
    gap_seconds: int = 1800,
    max_pages: int = 1000,
    watermark: str = "1 hour",
) -> DataFrame:
    """Custom stateful sessionization (applyInPandasWithState, one
    Python call per key per trigger over Arrow batches): emits
    (domain, session_start, session_end, n_pages, capped) where
    ``session_end`` is the LAST PAGE's timestamp (not +gap — custom
    semantics session_window cannot produce) and ``capped`` flags a
    session that exceeded ``max_pages`` (crawler trap / burst).
    Sessions close on an in-stream gap or on event-time timeout.

    Out-of-order arrivals (within the watermark) are exact as long as
    the affected session is still open: early events extend it
    downward or surface as their own older session. Events older than
    a session already emitted by timeout reappear as separate late
    sessions — the analogue of native session_window's late-row drop,
    but lossless."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdf_iter, state):
        import pandas as pd

        domain = key[0]

        def row(start, last, n, capped):
            return {
                "domain": domain,
                "session_start": pd.Timestamp(start, unit="s"),
                "session_end": pd.Timestamp(last, unit="s"),
                "n_pages": n,
                "capped": bool(capped),
            }

        if state.hasTimedOut:
            start, last, n, capped = state.get
            state.remove()
            yield pd.DataFrame([row(start, last, n, capped)])
            return

        ts = sorted(
            int(t.timestamp())
            for pdf in pdf_iter
            for t in pdf["warc_ts"]
            if t is not None and not pd.isna(t)
        )
        if not ts:
            return
        if state.exists:
            start, last, n, capped = state.get
        else:
            # n starts at 0 — the main loop below counts every event
            start, last, n, capped = ts[0], ts[0], 0, False
        closed = []
        # Cross-trigger reorder guard: an event can arrive EARLIER than
        # the open session's start (file-source delivery order is not
        # event-time order — two files with tied mtimes can swap).
        # Those events sessionize separately FIRST (they sort to the
        # front); the trailing old session then merges into the open
        # one if it reaches within gap of its start, else it closes.
        # Naively feeding them through the main loop would absorb them
        # forward (last = max(last, t)), silently gluing two sessions
        # into one stamped with the later times — the exact bug a
        # loaded test host exposed.
        i = 0
        old = None  # [start, last, n, capped] of the pre-start block
        while i < len(ts) and ts[i] < start - gap_seconds:
            t = ts[i]
            if old is None:
                old = [t, t, 1, False]
            elif t - old[1] > gap_seconds:
                closed.append(row(*old))
                old = [t, t, 1, False]
            else:
                old[1] = t
                old[2] += 1
            if old[2] > max_pages:
                old[3] = True
            i += 1
        if old is not None:
            if start - old[1] <= gap_seconds:
                start = old[0]
                n += old[2]
                capped = capped or old[3] or n > max_pages
            else:
                closed.append(row(*old))
        for t in ts[i:]:
            if t - last > gap_seconds:
                closed.append(row(start, last, n, capped))
                start, last, n, capped = t, t, 0, False
            # t may still precede start (within-gap early arrival):
            # extend the session downward, never absorb forward.
            start = min(start, t)
            last = max(last, t)
            n += 1
            if n > max_pages:
                capped = True
        state.update((start, last, n, capped))
        # close by timeout once the watermark passes last + gap;
        # clamp above the current watermark — late data (event time
        # already behind the watermark) would otherwise request a
        # timeout in the past, which Spark rejects.
        state.setTimeoutTimestamp(
            max(
                (last + gap_seconds) * 1000,
                state.getCurrentWatermarkMs() + 1000,
            )
        )
        if closed:
            yield pd.DataFrame(closed)

    return (
        # project BEFORE the stateful op: only (domain, warc_ts) cross
        # the Arrow boundary per trigger — shipping html binaries into
        # Python state functions would dominate the transfer cost.
        pages_stream.select(
            url_domain_expr("url").alias("domain"), "warc_ts"
        )
        .withWatermark("warc_ts", watermark)
        .groupBy("domain")
        .applyInPandasWithState(
            fn,
            SESSION_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
