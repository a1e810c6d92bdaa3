"""Custom stateful streaming operator: incremental SCD-2 validity
intervals over the live crawl (the streaming counterpart of
``corpusops.snapshot_intervals``) via ``applyInPandasWithState``
(SURVEY.md §2.10 — the designated surface for stateful semantics the
built-in windowed aggregations cannot express: a content run has no
fixed window; it closes only when a DIFFERENT fingerprint arrives).

Semantics: per url, consecutive snapshots sharing ``content_hash``
form a run; when a different hash arrives at time t, the previous
run emits ``(url, content_hash, valid_from, valid_to=t,
n_snapshots)``.  A row is emitted only once the watermark passes its
CLOSING boundary — no admissible late snapshot can then land inside
the interval — so output is FINAL (append mode).  The OPEN run
(current content) is never emitted: it has no valid_to yet; read it
from state-side batch queries or the batch operator (which pins the
-1 sentinel).  Late-but-admissible snapshots are held un-folded
until the watermark settles their ORDER, so an out-of-order
different-hash fetch splits the run exactly as the batch operator
would.

Scale: state per url = ONE open-run summary (from, last, n, hash) +
the snapshots still inside the watermark window — bounded by the
crawl rate × watermark delay, NOT by history (a page refetched
unchanged for years stays a four-field summary).  The only shuffle
is the groupBy(url) exchange any per-key operator needs; event-time
timeouts wake urls exactly when their oldest pending snapshot
settles, so quiet urls cost nothing per batch.
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

INTERVAL_SCHEMA = ("url string, content_hash string, "
                   "valid_from timestamp, valid_to timestamp, "
                   "n_snapshots long")
# open run (parallel scalars) + pending snapshots (parallel arrays,
# epoch seconds; hashes may repeat — runs are folded at settle time)
_STATE_SCHEMA = ("run_from long, run_last long, run_n long, "
                 "run_hash string, pend_ts array<long>, "
                 "pend_hash array<string>")

Run = Tuple[int, int, int, str]  # (from, last, n, hash)


def _fold_settled(run: Run | None,
                  settled: List[Tuple[int, str]]
                  ) -> Tuple[Run | None, List[Tuple[Run, int]]]:
    """Fold time-ordered settled snapshots into the open run.

    Pure function (unit-testable without a stream): returns the new
    open run and the list of (closed_run, closing_ts) intervals.
    """
    closed: List[Tuple[Run, int]] = []
    for ts, h in settled:
        if run is None:
            run = (ts, ts, 1, h)
        elif h == run[3]:
            run = (run[0], ts, run[2] + 1, h)
        else:
            closed.append((run, ts))
            run = (ts, ts, 1, h)
    return run, closed


def stream_snapshot_runs(pages_stream: DataFrame,
                         watermark: str = "1 hour",
                         url_col: str = "url",
                         ts_col: str = "warc_ts",
                         hash_col: str = "content_hash") -> DataFrame:
    """Crawl stream → watermark-final closed validity intervals."""
    tz = pages_stream.sparkSession.conf.get(
        "spark.sql.session.timeZone", "UTC")

    def fn(key: Tuple[str], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        url = key[0]
        wm_s = state.getCurrentWatermarkMs() // 1000

        run: Run | None = None
        pend: List[Tuple[int, str]] = []
        if state.exists:
            rf, rl, rn, rh, pts, phs = state.get
            if rn and rn > 0:
                run = (rf, rl, rn, rh)
            pend = list(zip(pts, phs))
        if not state.hasTimedOut:
            for pdf in pdfs:
                ts = pd.DatetimeIndex(pdf[ts_col]) \
                    .tz_localize(tz).asi8 // 10 ** 9
                pend.extend(zip((int(t) for t in ts),
                                pdf[hash_col].astype(str)))

        # snapshots strictly older than the watermark have a SETTLED
        # order (no admissible event can precede them); equal-ts
        # duplicates order by hash for determinism
        pend.sort()
        settled = [(t, h) for t, h in pend if t < wm_s]
        pend = [(t, h) for t, h in pend if t >= wm_s]

        run, closed = _fold_settled(run, settled)
        if run is not None or pend:
            state.update((
                run[0] if run else 0, run[1] if run else 0,
                run[2] if run else 0, run[3] if run else "",
                [t for t, _ in pend], [h for _, h in pend]))
            if pend:
                # wake when the oldest pending snapshot settles
                # (must be strictly ahead of the watermark: it is,
                # since pend ts >= wm_s)
                state.setTimeoutTimestamp((pend[0][0] + 1) * 1000)
        elif state.exists:
            state.remove()
        if closed:
            yield pd.DataFrame({
                "url": url,
                "content_hash": [r[3] for r, _ in closed],
                "valid_from": pd.to_datetime(
                    [r[0] for r, _ in closed], unit="s", utc=True),
                "valid_to": pd.to_datetime(
                    [t for _, t in closed], unit="s", utc=True),
                "n_snapshots": [r[2] for r, _ in closed]})

    pages = (pages_stream
             .select(F.col(url_col).alias("url"),
                     F.col(ts_col).alias(ts_col),
                     F.col(hash_col).cast("string").alias(hash_col))
             .where(F.col("url").isNotNull())
             .withWatermark(ts_col, watermark))
    return pages.groupBy("url").applyInPandasWithState(
        fn,
        outputStructType=INTERVAL_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
