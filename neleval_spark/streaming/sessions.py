"""Custom stateful streaming operator: per-host crawl sessionization
via ``applyInPandasWithState`` (SURVEY.md §2.10 — the designated
surface for stateful semantics the built-in windowed aggregations
cannot express: a session has no fixed window; it closes only when a
host goes quiet for ``gap``).

Semantics: consecutive fetches from one host belong to one session
while the event-time gap between them stays below ``gap_minutes``; a
session row (host, session_start, session_end, n_docs) is emitted
when the watermark passes the session's last fetch + gap (event-time
timeout), so output is final — late data inside the watermark still
extends its session.

Scale: state is ONE row of three longs per active host (bounded by
live hosts, not documents); the only shuffle is the groupBy(host)
exchange that any per-host operator needs; timeouts mean idle hosts
leave the state store.  Skew (one hot host) is bounded by the
per-batch group size, not history — history lives in the 3-long
state.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = ("host string, session_start timestamp, "
                  "session_end timestamp, n_docs long")
_STATE_SCHEMA = "start long, last long, n long"  # epoch seconds


def _merge_sessions(ts_sorted: list[int], gap_s: int,
                    state: tuple[int, int, int] | None):
    """Fold sorted fetch times into (closed_sessions, open_session).

    Pure function (unit-testable without a stream): interval merging
    over the existing open session plus the new fetch times, so a
    late event BEFORE the open session's start correctly extends
    ``session_start`` downward (within the gap) or forms its own,
    immediately-closed earlier session (beyond it).  The trailing
    session stays open.
    """
    intervals = [[t, t, 1] for t in ts_sorted]
    if state is not None:
        intervals.append([state[0], state[1], state[2]])
        intervals.sort()
    sessions = []
    cur = None
    for iv in intervals:
        if cur is None:
            cur = iv[:]
        elif iv[0] - cur[1] <= gap_s:
            cur[1] = max(cur[1], iv[1])
            cur[2] += iv[2]
        else:
            sessions.append(tuple(cur))
            cur = iv[:]
    return sessions, (tuple(cur) if cur is not None else None)


def stream_host_sessions(pages_stream: DataFrame,
                         gap_minutes: int = 30,
                         watermark: str = "1 hour") -> DataFrame:
    """pages stream → closed per-host session rows (append mode)."""
    gap_s = gap_minutes * 60
    # Arrow hands the Python worker tz-NAIVE timestamps rendered in
    # the SESSION time zone, while setTimeoutTimestamp compares
    # against the true-epoch watermark — localize with the session tz
    # captured here so non-UTC sessions don't close sessions hours
    # off.  (DST-ambiguous wallclocks raise per pandas; run event-time
    # pipelines in UTC sessions — the library's factory pins UTC.)
    tz = pages_stream.sparkSession.conf.get(
        "spark.sql.session.timeZone", "UTC")

    def fn(key: Tuple[str], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        host = key[0]

        def emit(rows):
            # tz-AWARE UTC outputs: Arrow carries the instant, so the
            # emitted timestamps are correct in any session time zone
            # (a naive series would be re-read as session-local)
            return pd.DataFrame(
                {"host": host,
                 "session_start": pd.to_datetime(
                     [r[0] for r in rows], unit="s", utc=True),
                 "session_end": pd.to_datetime(
                     [r[1] for r in rows], unit="s", utc=True),
                 "n_docs": [r[2] for r in rows]})

        if state.hasTimedOut:
            rows = [state.get] if state.exists else []
            state.remove()
            if rows:
                yield emit(rows)
            return

        ts = sorted(
            int(t)
            for pdf in pdfs
            for t in pd.DatetimeIndex(pdf["warc_ts"])
            .tz_localize(tz).asi8 // 10 ** 9)
        prev = state.get if state.exists else None
        closed, open_ = _merge_sessions(ts, gap_s, prev)
        if open_ is not None:
            state.update(open_)
            # close when the watermark passes last-fetch + gap
            state.setTimeoutTimestamp((open_[1] + gap_s) * 1000)
        if closed:
            yield emit(closed)

    pages = (
        pages_stream
        .select(
            # host = authority portion of the url (JVM expression —
            # the Python hop sees only (host, warc_ts))
            F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
            "warc_ts",
        )
        .where(F.col("host").isNotNull())
        .withWatermark("warc_ts", watermark)
    )
    return pages.groupBy("host").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
