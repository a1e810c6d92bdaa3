"""As-of (point-in-time) join — match each left row to the most
recent right row at-or-before its timestamp, per key.

The canonical temporal primitive for web-corpus construction: join a
derived table (mentions, labels, quality scores) to the crawl
SNAPSHOT of the page that was current when the row was produced;
or events to the latest preceding state change of the same user.
No reference counterpart (neleval is snapshot-free); semantics follow
the widely-published ASOF JOIN (kdb+, pandas ``merge_asof``,
DuckDB ASOF JOIN — public knowledge, independent implementation).

Spark-first design — the naive formulation is a range join
(``l.key = r.key AND r.ts <= l.ts`` + top-1), which explodes to
O(|matches|) intermediate rows before the filter: a key with q
queries and s snapshots materializes up to q*s rows.  Instead:

* UNION the two sides on (key, ts, side) with the right-side payload
  packed into ONE struct column (left rows carry a typed NULL);
* one window per key, ordered by (ts, side, payload):
  ``last(payload, ignorenulls=True)`` over unbounded-preceding rows
  is exactly "latest snapshot at-or-before me" — right rows sort
  BEFORE left rows at equal ts, so a snapshot stamped exactly at the
  query time matches (inclusive semantics, same as DuckDB/pandas);
* filter back to left rows and unpack the struct.

Cost: ONE hash-partition exchange on the key + a per-key sort —
O((q+s) log(q+s)) per key, never q*s.  All rows of one key land in
one task (inherent to per-key ordered semantics, same shape as
sessionize); a pathological hot key is bounded by its own row count,
not by a join product.

Determinism: within equal (ts, side) the window orders by the packed
payload struct (lexicographic over its fields), so duplicate
right-side timestamps resolve identically on every engine and
partitioning.  For hash-checked oracles, keep (key, right_ts) unique
(snapshot semantics) — then the tie-break never fires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str | None = None,
    prefix: str = "r_",
    tolerance: float | None = None,
) -> DataFrame:
    """Backward as-of join (left join): every left row, plus the
    columns of the most recent right row with the same key and
    ``right_ts <= left_ts`` (NULLs when no snapshot precedes).

    ``on``: equality key column(s), present in both frames.
    ``right_ts``: right-side timestamp column (defaults to
    ``left_ts``'s name).  Non-key right columns are emitted as
    ``prefix + name``.
    ``tolerance``: optional max staleness in SECONDS — a match older
    than ``left_ts - tolerance`` is nulled out (pandas
    ``merge_asof(tolerance=...)`` semantics).

    Forward as-of = apply this to negated/reversed timestamps.
    """
    right_ts = right_ts or left_ts
    on_cols = [on] if isinstance(on, str) else list(on)
    rpay = [c for c in right.columns if c not in on_cols]
    lpay = [c for c in left.columns if c not in on_cols]

    r = right.select(
        *on_cols,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*rpay).alias("_snap"),
    )
    snap_t = r.schema["_snap"].dataType
    l = left.select(  # noqa: E741
        *on_cols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(snap_t).alias("_snap"),
        F.struct(*lpay).alias("_row"),
    )
    row_t = l.schema["_row"].dataType
    u = l.unionByName(
        r.withColumn("_row", F.lit(None).cast(row_t)))

    w = (
        Window.partitionBy(*on_cols)
        .orderBy("_ts", "_side", "_snap")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = (
        u.withColumn("_m", F.last("_snap", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )
    if tolerance is not None:
        fresh = (
            F.unix_micros(F.col("_ts"))
            - F.unix_micros(F.col("_m").getField(right_ts))
        ) <= int(tolerance * 1_000_000)
        m = m.withColumn("_m", F.when(fresh, F.col("_m")))
    return m.select(
        *on_cols,
        *[F.col(f"_row.{c}").alias(c) for c in lpay],
        *[F.col("_m").getField(c).alias(prefix + c) for c in rpay],
    )
