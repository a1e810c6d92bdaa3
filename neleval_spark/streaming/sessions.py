"""Custom stateful streaming operator: per-host crawl sessionization
via ``applyInPandasWithState`` (SURVEY.md §2.10 — the designated
surface for stateful semantics the built-in windowed aggregations
cannot express: a session has no fixed window; it closes only when a
host goes quiet for ``gap``).

Semantics: consecutive fetches from one host belong to one session
while the event-time gap between them stays below ``gap_minutes``; a
session row (host, session_start, session_end, n_docs) is emitted
only once the watermark passes the session's last fetch + gap, so
output is FINAL — any late event the watermark still admits (event
time >= watermark) that lands within ``gap`` of a pending session
extends or merges it before emission.  Gap-closed sessions therefore
stay in state as *pending* until watermark-finality, rather than
being emitted eagerly in the data path (which would make a
late-but-admissible event split the session — the round-3 advice
defect).

Scale: state is one (start, last, n) triple per PENDING session for
the host — bounded by ceil(watermark_delay / gap) + 1 sessions, since
pending sessions older than the watermark are flushed every batch; it
is NOT proportional to document count.  The only shuffle is the
groupBy(host) exchange any per-host operator needs; event-time
timeouts evict idle hosts from the state store.  Skew (one hot host)
is bounded by the per-batch group size, not history — history lives
in the few-longs state.
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = ("host string, session_start timestamp, "
                  "session_end timestamp, n_docs long")
# pending sessions, time-sorted, parallel arrays (epoch seconds)
_STATE_SCHEMA = ("starts array<long>, lasts array<long>, "
                 "ns array<long>")

Session = Tuple[int, int, int]  # (start, last, n_docs)


def _merge_sessions(ts_sorted: list[int], gap_s: int,
                    pending: List[Session]) -> List[Session]:
    """Fold sorted fetch times into the pending-session list.

    Pure function (unit-testable without a stream): interval merging
    over ALL pending sessions plus the new fetch times, so a late
    event may extend a pending session's start downward, bridge two
    pending sessions into one, or form its own earlier session.
    Returns the merged, time-sorted session list; finality is the
    caller's concern (watermark vs last+gap).
    """
    intervals = [[t, t, 1] for t in ts_sorted]
    intervals.extend([s, e, n] for s, e, n in pending)
    intervals.sort()
    sessions: List[Session] = []
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
    if cur is not None:
        sessions.append(tuple(cur))
    return sessions


def _split_final(sessions: List[Session], gap_s: int,
                 wm_s: int) -> Tuple[List[Session], List[Session]]:
    """(final, still_pending): a session is final once the watermark
    passes last_fetch + gap — no admissible event can extend it."""
    final = [s for s in sessions if s[1] + gap_s <= wm_s]
    keep = [s for s in sessions if s[1] + gap_s > wm_s]
    return final, keep


def stream_host_sessions(pages_stream: DataFrame,
                         gap_minutes: int = 30,
                         watermark: str = "1 hour") -> DataFrame:
    """pages stream → watermark-final per-host session rows (append)."""
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

        wm_s = state.getCurrentWatermarkMs() // 1000
        pending: List[Session] = []
        if state.exists:
            starts, lasts, ns = state.get
            pending = list(zip(starts, lasts, ns))

        if state.hasTimedOut:
            ts: list[int] = []
        else:
            ts = sorted(
                int(t)
                for pdf in pdfs
                for t in pd.DatetimeIndex(pdf["warc_ts"])
                .tz_localize(tz).asi8 // 10 ** 9)

        sessions = _merge_sessions(ts, gap_s, pending)
        final, keep = _split_final(sessions, gap_s, wm_s)
        if keep:
            state.update(([s[0] for s in keep],
                          [s[1] for s in keep],
                          [s[2] for s in keep]))
            # wake when the EARLIEST pending session becomes final;
            # keep[0][1]+gap > wm_s by construction, so the timestamp
            # is strictly ahead of the watermark as the API requires
            state.setTimeoutTimestamp((keep[0][1] + gap_s) * 1000)
        elif state.exists:
            state.remove()
        if final:
            yield emit(final)

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
