"""Streaming exact deduplication of crawl pages.

Engine-native design: Structured Streaming already ships the right
stateful operator — ``dropDuplicatesWithinWatermark`` — so streaming
dedup is a content fingerprint (JVM ``xxhash64``, no Python hop) plus
that operator, not a hand-rolled state store.  State is bounded: a
fingerprint is kept only until the event-time watermark passes its
arrival, so long-running crawls don't accumulate unbounded keys (the
failure mode of plain ``dropDuplicates`` on streams).

Division of labour at 100 TB: this operator removes the bursty exact
duplicates a crawl produces *within* the watermark horizon (retries,
mirror fetches, republication storms — the overwhelming majority of
exact dups arrive close together); corpus-lifetime near-dup removal
is the batch index's job (:mod:`neleval_spark.functions.dedup_index`),
run over the compacted sink.

No reference counterpart (the reference is batch-only); additive
streaming surface per SURVEY §2.10.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_dedup(pages_stream: DataFrame,
                 time_col: str = "warc_ts",
                 fingerprint_cols: Sequence[str] = ("text",),
                 watermark: str = "30 minutes",
                 mode: str = "exact",
                 n_bits: int = 16) -> DataFrame:
    """First-seen-wins dedup of a page stream.

    Rows whose content fingerprint was already seen within the
    event-time watermark horizon are dropped; the first occurrence
    passes through unchanged (plus a ``content_fp`` audit column).
    Duplicates straddling more than ``watermark`` of event time may
    both survive — by design, state stays bounded; the batch index
    catches them later.

    ``mode="exact"`` fingerprints with ``xxhash64`` over
    ``fingerprint_cols``.  ``mode="simhash"`` fingerprints with the
    in-row ``n_bits``-bit SimHash of the first fingerprint column
    (:func:`neleval_spark.functions.textops.simhash_column`), making
    the dedup NEAR-duplicate: documents whose edits leave every
    majority bit unchanged collide into one bucket — guaranteed for
    token-multiset-preserving variants (case, whitespace,
    punctuation, markup, reordering: the classic mirror-fetch
    deltas), and probabilistic for small token edits (a zero-margin
    bit can flip on a one-token change).  Coarser ``n_bits`` = more
    aggressive merging.  Both modes are pure column
    expressions — legal before the stateful operator (an aggregation
    would not be) and JVM-side."""
    if mode == "exact":
        fp = F.xxhash64(*[F.col(c) for c in fingerprint_cols])
    elif mode == "simhash":
        from ..functions.textops import simhash_column

        fp = simhash_column(F.col(fingerprint_cols[0]), n_bits)
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return (pages_stream
            .withColumn("content_fp", fp)
            .withWatermark(time_col, watermark)
            .dropDuplicatesWithinWatermark(["content_fp"]))
