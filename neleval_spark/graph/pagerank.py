"""Distributed PageRank — entity-salience ranking for the
constructed knowledge graph (no reference counterpart; the classic
power-iteration algorithm of Page et al., public knowledge,
independent implementation).

Used as the salience score over the emitted co-occurrence /
mentioned_in triples: which entities sit at the center of the
extracted graph.  The same operator ranks any (src, dst) edge table.

Spark-first design, fixed iteration count:

* per-iteration work is ONE equi-join (edges ⋈ ranks on src) + ONE
  aggregation (sum of contributions by dst) — both hash-partitioned
  on vertex id; no driver-side state beyond two scalars (vertex
  count, dangling mass);
* out-degrees are computed once and live IN the rank table (joined
  once up front), so iterations never re-join the degree table;
* dangling vertices (no out-edges) redistribute their mass uniformly
  — the aggregated dangling mass is a scalar `agg` per iteration, not
  a shuffle;
* lineage is truncated with ``localCheckpoint`` every iteration (the
  same bounded-plan discipline as connected_components);
* every iteration's ranks are ROUNDED to ``round_scale`` decimals.
  This is the determinism contract: double addition is
  order-dependent, so unrounded power iteration drifts across
  engines/partitionings; rounding each iteration's OUTPUT pins every
  iteration's INPUT, which is what lets a DuckDB oracle hash-match
  the distributed run (``__spark_entry__.Q_ENTITY_SALIENCE_SQL``
  unrolls the same iterations as CTEs).  Caveat (not a guarantee):
  the WITHIN-iteration double sums (contribution aggregate, dangling
  mass) are still order-dependent, so a sum landing within one ulp of
  a ``round_scale`` boundary could round differently across engines
  or partitionings — per-iteration rounding makes divergence
  overwhelmingly unlikely (it must hit a half-ulp boundary at 9 dp),
  not impossible.  Partitioning-invariance and the cross-engine hash
  are pinned empirically in tests; for a hard guarantee, use
  fixed-point integer ranks (not implemented — doubles + rounding is
  the pragmatic contract, same float-tie caveat as CLAUDE.md's
  cross-engine oracle rule);
* early stop: when the ROUNDED ranks reach a fixed point
  (max |Δrank| ≤ ``tol``, checked every ``check_every`` iterations),
  remaining iterations are provably no-ops at ``tol=0.0`` — identical
  output to the fixed iteration count, so converged graphs don't pay
  all ``iters`` rounds at scale.  The check is a 1-row aggregate over
  the (vertex-count-sized, checkpointed) rank table — constant driver
  traffic, never edge-proportional.

At 10^12 edges: the join is src-partitioned (AQE skew splitting for
hub vertices), the aggregate has map-side partials, and the rank
table is one row per vertex — the edge table is never materialized
into driver memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 10,
    damping: float = 0.85,
    round_scale: int = 9,
    tol: float | None = 0.0,
    check_every: int = 1,
    stats: dict | None = None,
    reset: DataFrame | None = None,
    weight: str | None = None,
) -> DataFrame:
    """Rank vertices of a directed graph; returns (vertex, rank).

    ``edges``: one row per directed edge (parallel edges count once —
    deduped here).  Ranks sum to ~1 (up to rounding).

    ``tol``: early-stop tolerance on max |Δrank| between consecutive
    ROUNDED rank vectors.  The default 0.0 stops only at an exact
    fixed point of the rounded iteration — output is then identical
    to running all ``iters`` rounds (every further round is a no-op),
    so the DuckDB oracle's unrolled-CTE iterations still hash-match.
    ``None`` disables the check (always run ``iters`` rounds).
    ``stats`` (optional dict) receives ``{"iterations": k}`` — the
    number of rounds actually executed.

    ``reset``: optional (vertex, p) personalization / teleport vector
    (personalized PageRank, Haveliwala 2002 — public knowledge).
    When given, the start vector is p, the teleport term is
    ``(1-damping)*p(v)`` instead of ``(1-damping)/n``, and dangling
    mass redistributes along p instead of uniformly.  Weights are
    used AS GIVEN (caller normalizes to sum 1); seeds absent from the
    graph's vertex set contribute nothing (their mass is dropped, so
    ranks then sum to <1 — intentional, mirrors the left join).
    p is joined into the rank table ONCE (seed tables are tiny —
    AQE broadcasts the join), so per-iteration work is unchanged:
    one equi-join + one aggregation.  ``reset=None`` keeps the
    original uniform-teleport arithmetic bit-for-bit (its DuckDB
    oracle depends on the exact expression shape).

    ``weight``: optional edge-weight column — a vertex spreads its
    rank proportionally to outgoing weight (`rank*w/Σw`) instead of
    uniformly.  Parallel edges are SUMMED per (src, dst);
    non-positive weights are dropped.  Use INTEGER weights: the
    per-src weight sums are then exact in any partitioning/engine
    (the CLAUDE.md cross-engine rule), keeping the oracle contract.
    Orthogonal to ``reset``; ``weight=None`` keeps the unweighted
    plan and arithmetic untouched.
    """
    # e and vertices are LAZY local checkpoints: the vertex count
    # below is the one action that computes both plans, so their
    # checkpoint blocks are written as a side effect of a job that had
    # to run anyway — two fewer eager materialization jobs at setup
    # (each job is ~0.2-0.3 s of scheduling/AQE-barrier overhead at
    # bench scale; the blocks and lineage truncation are identical).
    if weight is None:
        e = (
            edges.select(F.col(src).alias("src"),
                         F.col(dst).alias("dst"))
            .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
            .distinct()
            .localCheckpoint(eager=False)
        )
    else:
        e = (
            edges.select(F.col(src).alias("src"),
                         F.col(dst).alias("dst"),
                         F.col(weight).cast("long").alias("w"))
            .where(F.col("src").isNotNull() & F.col("dst").isNotNull()
                   & (F.col("w") > 0))
            .groupBy("src", "dst")
            .agg(F.sum("w").alias("w"))
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
        return vertices.withColumn("rank", F.lit(0.0))

    if weight is None:
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    else:
        deg = e.groupBy("src").agg(F.sum("w").alias("deg"))
    # rank table carries the out-degree so iterations join ONCE per
    # round (ranks ⋈ edges), never a second degree join
    ranks = vertices.join(deg.withColumnRenamed("src", "vertex"),
                          "vertex", "left")
    if reset is None:
        ranks = ranks.select(
            "vertex",
            F.round(F.lit(1.0 / n), round_scale).alias("rank"),
            F.coalesce("deg", F.lit(0)).alias("deg"),
        )
        carry = ["vertex", "rank", "deg"]
    else:
        # p joins into the rank table once, like deg
        ranks = ranks.join(
            reset.select("vertex", F.col("p").cast("double").alias("p")),
            "vertex", "left",
        ).select(
            "vertex",
            F.round(F.coalesce("p", F.lit(0.0)), round_scale)
            .alias("rank"),
            F.coalesce("deg", F.lit(0)).alias("deg"),
            F.coalesce("p", F.lit(0.0)).alias("p"),
        )
        carry = ["vertex", "rank", "deg", "p"]
    ranks = ranks.localCheckpoint(eager=False)

    # ONE job per iteration (r6): each round's rank table is a LAZY
    # local checkpoint materialized by the same 1-row aggregate that
    # collects next round's dangling mass and the early-stop delta —
    # the old shape paid one eager-checkpoint job PLUS one delta job
    # per round, with the dangling mass as an in-plan broadcast
    # subquery (an extra 1-row-agg + BroadcastExchange stage inside
    # every round's job).  The collected mass is re-injected as a
    # literal: a Python float IS an IEEE double and the py4j literal
    # round-trip is bit-exact (probed: 2,200 random doubles, 0
    # mismatches), and the sum itself is the same aggregate over the
    # same checkpointed partitions, so every per-row double op is
    # unchanged and the unrolled DuckDB oracles still hash-match.
    _stats = ranks.agg(
        F.coalesce(F.sum(F.when(F.col("deg") == 0, F.col("rank"))),
                   F.lit(0.0)).alias("_d")).first()
    dang_val = _stats["_d"]

    base = (1.0 - damping) / n
    done = 0
    for i in range(iters):
        share = (F.col("rank") / F.col("deg") if weight is None
                 else F.col("rank") * F.col("w") / F.col("deg"))
        contrib = (
            e.join(ranks.withColumnRenamed("vertex", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(share).alias("c"))
        )
        if reset is None:
            new_rank = F.round(
                F.lit(base)
                + F.lit(damping)
                * (F.coalesce(F.col("c"), F.lit(0.0))
                   + F.lit(dang_val) / F.lit(n)),
                round_scale,
            )
        else:
            new_rank = F.round(
                F.lit(1.0 - damping) * F.col("p")
                + F.lit(damping)
                * (F.coalesce(F.col("c"), F.lit(0.0))
                   + F.lit(dang_val) * F.col("p")),
                round_scale,
            )
        keep = [c for c in carry if c != "rank"]
        ranks = (
            ranks.select(*keep, F.col("rank").alias("_prev"))
            .join(contrib.withColumnRenamed("dst", "vertex"),
                  "vertex", "left")
            .select(*keep, "_prev", new_rank.alias("rank"))
            .select(*carry, "_prev")
            .localCheckpoint(eager=False)
        )
        # the materializing action: dangling mass for the NEXT round
        # and this round's max |Δrank| in one driver round trip over
        # the (vertex-count-sized, now-checkpointed) rank table
        row = ranks.agg(
            F.coalesce(F.sum(F.when(F.col("deg") == 0, F.col("rank"))),
                       F.lit(0.0)).alias("_d"),
            F.max(F.abs(F.col("rank") - F.col("_prev"))).alias("_delta"),
        ).first()
        dang_val = row["_d"]
        done = i + 1
        if tol is not None and done % check_every == 0 \
                and done < iters:
            delta = row["_delta"]
            if delta is not None and delta <= tol:
                break
    if stats is not None:
        stats["iterations"] = done
    return ranks.select("vertex", "rank")


def entity_salience(triples: DataFrame, top_k: int = 20) -> DataFrame:
    """Salience of entities in an emitted triple table: PageRank over
    the undirected co-occurrence graph (each cooccurs_with pair
    contributes both directions).  Returns the top_k (entity, salience)
    rows, deterministic order (salience desc, entity)."""
    pairs = triples.where(F.col("pred") == "cooccurs_with") \
        .select("subj", "obj")
    both = pairs.union(
        pairs.select(F.col("obj").alias("subj"),
                     F.col("subj").alias("obj")))
    pr = pagerank(both, src="subj", dst="obj")
    return (
        pr.select(F.col("vertex").alias("entity"),
                  F.round(F.col("rank"), 6).alias("salience"))
        .orderBy(F.col("salience").desc(), "entity")
        .limit(top_k)
    )


def related_entities(
    triples: DataFrame,
    seeds: list[str],
    top_k: int = 20,
    iters: int = 10,
) -> DataFrame:
    """Related-entity retrieval for the constructed KG: personalized
    PageRank over the undirected co-occurrence graph, teleporting to
    the ``seeds`` (uniform weight 1/len(seeds) each).  Returns the
    top_k (entity, relatedness) rows EXCLUDING the seeds themselves,
    deterministic order (relatedness desc, entity).

    The classic "more like these" query over an entity graph; at
    10^12 edges it inherits pagerank's per-iteration join+agg shape —
    the seed vector is a broadcast-sized table, never a shuffle."""
    spark = triples.sparkSession
    w = 1.0 / len(seeds)
    reset = spark.createDataFrame([(s, w) for s in seeds],
                                  "vertex string, p double")
    pairs = triples.where(F.col("pred") == "cooccurs_with") \
        .select("subj", "obj")
    both = pairs.union(
        pairs.select(F.col("obj").alias("subj"),
                     F.col("subj").alias("obj")))
    pr = pagerank(both, src="subj", dst="obj", iters=iters,
                  reset=reset)
    return (
        pr.where(~F.col("vertex").isin(seeds))
        .select(F.col("vertex").alias("entity"),
                F.round(F.col("rank"), 6).alias("relatedness"))
        .where(F.col("relatedness") > 0)
        .orderBy(F.col("relatedness").desc(), "entity")
        .limit(top_k)
    )
