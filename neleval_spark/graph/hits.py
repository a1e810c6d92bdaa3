"""Distributed HITS — hubs and authorities over a directed edge
table (Kleinberg 1999, "Authoritative sources in a hyperlinked
environment"; public knowledge, independent implementation; no
reference counterpart — wikilinks/neleval is evaluation-side).

Complements ``graph/pagerank.py`` on the web link graph: PageRank
ranks endorsement flow, HITS separates *hubs* (pages that point at
good authorities) from *authorities* (pages good hubs point at) —
the classic pair of curation signals for a crawl.

Same execution discipline as pagerank:

* per iteration: TWO equi-joins + TWO aggregations (one per
  direction — auth from hubs over in-edges, then hub from the fresh
  auths over out-edges), both hash-partitioned on vertex id;
* L1 normalization (divide by the score sum) instead of Kleinberg's
  L2 — any fixed norm yields the same ranking, and the L1 scalar is
  a plain SUM both engines aggregate identically BEFORE one
  correctly-rounded IEEE division (no sqrt in the oracle contract);
  the normalizer is an in-plan broadcast 1-row aggregate
  (cross-joined), never a driver collect;
* every iteration's scores are ROUNDED to ``round_scale`` decimals —
  the same cross-engine determinism contract as pagerank (rounding
  each OUTPUT pins each iteration's INPUT so an unrolled-CTE DuckDB
  oracle can hash-match; the within-iteration double sums keep the
  same half-ulp caveat pagerank documents);
* lineage truncated with ``localCheckpoint`` every iteration;
* early stop at a fixed point of the ROUNDED iteration
  (max |Δhub|, |Δauth| ≤ ``tol``), identical output to running all
  ``iters`` rounds.

At 10^12 edges: both joins are vertex-partitioned with AQE skew
splitting, aggregates have map-side partials, the score table is one
row per vertex, and the only driver traffic is the 1-row early-stop
check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 10,
    round_scale: int = 9,
    tol: float | None = 0.0,
    check_every: int = 1,
    stats: dict | None = None,
) -> DataFrame:
    """Hub and authority scores; returns (vertex, hub, auth).

    ``edges``: one row per directed edge (parallel edges count once —
    deduped here).  Hub scores sum to ~1 and auth scores sum to ~1
    (up to rounding).  Vertices with no in-edges get auth 0; no
    out-edges, hub 0.

    ``tol``/``check_every``/``stats``: as in ``pagerank`` — early
    stop when consecutive ROUNDED (hub, auth) vectors agree to within
    ``tol`` (default 0.0 = exact fixed point, output identical to the
    full ``iters`` rounds); ``stats`` receives the executed count.
    """
    # lazy checkpoints: the vertex count is the one action that
    # materializes both (same block layout, two fewer setup jobs — the
    # r6 one-job-per-round discipline, see pagerank.py)
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint(eager=False)
    )
    vertices = (
        e.select(F.col("src").alias("vertex"))
        .union(e.select("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = vertices.count()
    if n == 0:
        return vertices.withColumn("hub", F.lit(0.0)) \
                       .withColumn("auth", F.lit(0.0))

    scores = vertices.select(
        "vertex",
        F.round(F.lit(1.0 / n), round_scale).alias("hub"),
        F.round(F.lit(1.0 / n), round_scale).alias("auth"),
    ).localCheckpoint(eager=False)

    done = 0
    for i in range(iters):
        # auth(v) ∝ Σ hub(u) over in-edges (u, v)
        a_raw = (
            e.join(scores.withColumnRenamed("vertex", "src")
                   .select("src", "hub"), "src")
            .groupBy("dst").agg(F.sum("hub").alias("_a"))
        )
        sa = a_raw.agg(
            F.coalesce(F.sum("_a"), F.lit(0.0)).alias("_sa"))
        half = (
            scores.select("vertex", "hub",
                          F.col("hub").alias("_ph"),
                          F.col("auth").alias("_pa"))
            .join(a_raw.withColumnRenamed("dst", "vertex"),
                  "vertex", "left")
            .crossJoin(F.broadcast(sa))
            .select(
                "vertex", "hub", "_ph", "_pa",
                F.when(
                    F.col("_sa") > 0,
                    F.round(F.coalesce(F.col("_a"), F.lit(0.0))
                            / F.col("_sa"), round_scale),
                ).otherwise(F.lit(0.0)).alias("auth"),
            )
        )
        # hub(u) ∝ Σ auth(v) over out-edges (u, v) — the FRESH auths
        h_raw = (
            e.join(half.withColumnRenamed("vertex", "dst")
                   .select("dst", "auth"), "dst")
            .groupBy("src").agg(F.sum("auth").alias("_h"))
        )
        sh = h_raw.agg(
            F.coalesce(F.sum("_h"), F.lit(0.0)).alias("_sh"))
        scores = (
            half.select("vertex", "auth", "_ph", "_pa")
            .join(h_raw.withColumnRenamed("src", "vertex"),
                  "vertex", "left")
            .crossJoin(F.broadcast(sh))
            .select(
                "vertex",
                F.when(
                    F.col("_sh") > 0,
                    F.round(F.coalesce(F.col("_h"), F.lit(0.0))
                            / F.col("_sh"), round_scale),
                ).otherwise(F.lit(0.0)).alias("hub"),
                "auth", "_ph", "_pa",
            )
            .localCheckpoint(eager=False)
        )
        done = i + 1
        if tol is not None and done % check_every == 0 \
                and done < iters:
            # ONE job per round (r6): this 1-row agg over the
            # vertex-sized table IS the action that materializes the
            # round's lazy checkpoint — the old eager-checkpoint job
            # disappears.  Rounds without a check (check_every > 1, or
            # tol=None) stay lazy; the next materializing action (or
            # the caller's) computes them, persisting each round's
            # checkpoint blocks as it goes — same block layout, fewer
            # scheduling barriers.
            delta = scores.agg(F.greatest(
                F.max(F.abs(F.col("hub") - F.col("_ph"))),
                F.max(F.abs(F.col("auth") - F.col("_pa"))),
            )).first()[0]
            if delta is not None and delta <= tol:
                break
    if stats is not None:
        stats["iterations"] = done
    return scores.select("vertex", "hub", "auth")
