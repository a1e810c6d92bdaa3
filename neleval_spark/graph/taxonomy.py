"""Distributed taxonomy closure and instance-type inheritance.

Generalizes the reference's driver-side hierarchy recursion
(reference neleval/prepare.py:107-145, WeightsForHierarchy: a JSON
{parent: [children]} dict walked with Python recursion) to an
EDGE-TABLE hierarchy too large for the driver — e.g. a
Wikidata-scale subclass_of graph (~3M edges) — while keeping the
reference's semantics: every (descendant, ancestor) pair at its
minimum hop distance, so decay**depth type weights
(operators/weights.py) can be derived from the closure.

Algorithm: min-plus path doubling.  ``R1`` = the edge set at depth
1; each round composes ``R`` with itself (equi-join ancestor=node,
depths add) and re-minimizes per pair, so after k rounds every pair
whose shortest path is ≤ 2^k carries its exact minimum depth.
Cycles are safe: pairs only accumulate and min-depths only
decrease, so the (count, sum-of-depths) pair is a monotone
convergence witness — the loop stops the first round it is
unchanged.  ceil(log2(max_depth)) rounds bound the work for
adversarial chains.

Scale shape (the load-bearing design decision): the closure loop
runs ONLY over the schema-level taxonomy — a vocabulary-sized table
(10^2..10^6 rows; ``max_nodes`` refuses anything bigger, same
stance as graph/pattern.py's cartesian refusal) — so each round is
one self-equi-join plus one hash aggregate of a small table,
lineage truncated per round with ``localCheckpoint`` like
graph/redirects.py.  The 10^9-row INSTANCE table never enters the
loop: ``infer_types`` applies the finished closure with a single
broadcast hash join (closure ≪ 8GB broadcast limit by the
``max_nodes`` guard) and — for the common single-asserted-type KB —
zero shuffles end-to-end (``dedup=False``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def taxonomy_closure(
    edges: DataFrame,
    child: str = "child",
    parent: str = "parent",
    max_depth: int = 32,
    max_nodes: int = 2_000_000,
    stats: dict | None = None,
) -> DataFrame:
    """Transitive closure of a schema-level is-a edge table.

    ``edges``: (child, parent) rows — child is-a parent.  Returns
    one row per reachable pair: (node, ancestor, depth) with
    ``depth`` the exact MINIMUM number of edges from node up to
    ancestor (≥1; a node inside a cycle can reach itself).

    ``max_depth``: chains longer than this may come back with a
    conservative (still correct-pair, possibly non-minimal) depth;
    the loop runs ceil(log2(max_depth)) doubling rounds but exits
    early on convergence, so an actual taxonomy (depth ≤ ~20)
    finishes in ~5 rounds regardless of the cap.

    ``max_nodes``: refuses instance-scale inputs — the closure of a
    non-schema graph is quadratic in the worst case and belongs in
    graph/neighborhood.py (bounded k-hop) or
    graph/connected_components.py instead.
    """
    if max_depth < 2:
        raise ValueError("max_depth must be at least 2")
    e = (
        edges.select(F.col(child).alias("node"),
                     F.col(parent).alias("ancestor"))
        .where(F.col("node").isNotNull()
               & F.col("ancestor").isNotNull())
        .distinct()
    )
    n_nodes = (
        e.select(F.col("node").alias("n"))
        .union(e.select(F.col("ancestor").alias("n")))
        .distinct()
        .count()
    )
    if n_nodes > max_nodes:
        raise ValueError(
            f"taxonomy_closure: {n_nodes} distinct nodes exceeds "
            f"max_nodes={max_nodes}. The closure loop is meant for "
            "the schema-level taxonomy (vocabulary-sized); for "
            "instance-scale graphs use graph/neighborhood.py "
            "(bounded k-hop) or connected_components.")

    # lazy checkpoints: the per-round state collect (count + depth
    # sum) is the materializing action — one job per doubling round
    # instead of two (the r6 discipline, see pagerank.py)
    r = e.withColumn("depth", F.lit(1).cast("long")).localCheckpoint(
        eager=False)
    state = r.agg(
        F.count(F.lit(1)).alias("c"),
        F.sum("depth").alias("s")).first()
    prev = (state["c"], state["s"] or 0)

    rounds = max(1, (max_depth - 1).bit_length())
    done = 0
    for i in range(rounds):
        lo = r.select(F.col("node").alias("_n"),
                      F.col("ancestor").alias("_m"),
                      F.col("depth").alias("_d"))
        comp = (
            lo.join(r, lo["_m"] == r["node"])
            .select(F.col("_n").alias("node"),
                    F.col("ancestor"),
                    (F.col("_d") + F.col("depth")).alias("depth"))
        )
        r2 = (
            r.unionByName(comp)
            .groupBy("node", "ancestor")
            .agg(F.min("depth").alias("depth"))
            .localCheckpoint(eager=False)
        )
        state = r2.agg(
            F.count(F.lit(1)).alias("c"),
            F.sum("depth").alias("s")).first()
        cur = (state["c"], state["s"] or 0)
        r = r2
        done = i + 1
        if cur == prev:  # no pair added, no depth lowered: fixpoint
            break
        prev = cur
    if stats is not None:
        stats["rounds"] = done
        stats["pairs"] = cur[0]
        stats["nodes"] = n_nodes
    return r


def infer_types(
    instances: DataFrame,
    closure: DataFrame,
    entity: str = "entity",
    type_col: str = "type",
    dedup: bool = True,
) -> DataFrame:
    """Expand asserted instance types to all taxonomy ancestors.

    ``instances``: (entity, type, ...) — the 10^9-row side; only
    (entity, type) are consumed.  ``closure``: taxonomy_closure
    output over the SAME type vocabulary.  Returns
    (entity, type, depth): depth 0 = asserted, depth ≥ 1 = inherited
    at its minimum distance.

    The closure is broadcast (schema-sized by construction), so the
    instance table is never shuffled for the join.  ``dedup=True``
    re-minimizes per (entity, type) — needed only when one entity
    carries MULTIPLE asserted types whose ancestor cones overlap;
    for single-typed instance tables pass ``dedup=False`` and the
    whole operator is shuffle-free (broadcast join + union only).
    """
    asserted = instances.select(
        F.col(entity).alias("entity"),
        F.col(type_col).alias("type"),
        F.lit(0).cast("long").alias("depth"))
    inherited = (
        instances.select(F.col(entity).alias("entity"),
                         F.col(type_col).alias("_t"))
        .join(F.broadcast(closure), F.col("_t") == closure["node"])
        .select("entity", F.col("ancestor").alias("type"), "depth")
    )
    out = asserted.unionByName(inherited)
    if dedup:
        out = out.groupBy("entity", "type").agg(
            F.min("depth").alias("depth"))
    return out
