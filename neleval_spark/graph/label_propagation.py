"""Distributed label-propagation community detection — the
communities of the constructed knowledge graph (no reference
counterpart; the classic algorithm of Raghavan, Albert & Kumara 2007,
"Near linear time algorithm to detect community structures in
large-scale networks", public knowledge, independent implementation).

Groups the entities of the emitted co-occurrence graph into densely
connected clusters — the construction-side complement of
connected_components (CC answers "reachable at all?", LPA answers
"tightly knit?") and the third member of the iterative-graph family
next to pagerank.

Spark-first design, same discipline as :mod:`.pagerank`:

* SYNCHRONIZED updates with a deterministic tie-break: every round,
  each vertex adopts the most frequent label among its neighbours'
  previous-round labels PLUS one vote for its own previous label
  (a unit self-loop — the standard stabilization against the
  synchronous bipartite flip-flop: without it an isolated edge pair
  swaps labels forever), ties broken by the SMALLEST label.  Classic
  LPA updates asynchronously with random tie-breaks — non-reproducible
  by construction; the synchronized min-tie-break variant is a pure
  function of (graph, round count), so the same DuckDB unrolled-CTE
  oracle strategy as entity_salience hash-matches it exactly (label
  identity is the vertex-id string, frequencies are integers — no
  float ties, per the cross-engine oracle rule).  Synchrony can still
  oscillate on larger bipartite structures: the contract is therefore
  "the label state after ``iters`` synchronized rounds", with an
  early stop only at an exact fixed point (provably identical output
  to running all rounds).
* per-round work is ONE equi-join (edges ⋈ labels on the neighbour
  end) + ONE count aggregate keyed by (vertex, label) + ONE
  ``min_by`` argmax per vertex.  The (vertex, label) key spreads a
  giant community's label over its member space — no hot single key;
  map-side partials absorb hub fan-in (the CC witness argument); AQE
  skew-splits the hub side of the join.
* isolated vertices keep their label (left join + coalesce);
* lineage is truncated with ``localCheckpoint`` every round;
* the fixed-point check is a 1-row aggregate over the vertex-sized
  label table — constant driver traffic, never edge-proportional.

At 10^12 edges nothing here is driver-resident: labels are one row
per vertex, edges are never collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    check_every: int = 1,
    early_stop: bool = True,
    stats: dict | None = None,
) -> DataFrame:
    """Communities of an undirected graph; returns (vertex, label).

    ``edges`` is read as undirected: each (src, dst) row contributes
    both directions; parallel edges count once; input self-loops
    collapse into the single unit self-vote every vertex already
    gets.  Labels start as the vertex id, so the output label of a
    community is the id of one of its members (deterministically
    chosen).

    Output contract: the synchronized label state after ``iters``
    rounds.  ``early_stop`` breaks out when a round changes NO label
    — every further round is then provably a no-op, so output is
    identical to running all ``iters`` rounds and the unrolled
    oracle still matches.  ``stats`` receives
    ``{"iterations": k}`` (rounds actually executed).
    """
    e0 = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .where(F.col("src") != F.col("dst"))
    )
    sym = e0.union(e0.select(F.col("dst").alias("src"),
                             F.col("src").alias("dst")))
    # unit self-loop per vertex = the self-vote (see module docstring)
    # lazy checkpoints, materialized together by the first round's
    # changed-count action (the r6 one-job-per-round discipline, see
    # pagerank.py) — two fewer setup jobs, identical blocks
    e = (
        sym.union(sym.select("src", F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        e.select(F.col("src").alias("vertex"))
        .distinct()
        .select("vertex", F.col("vertex").alias("label"))
        .localCheckpoint(eager=False)
    )

    done = 0
    for i in range(iters):
        votes = (
            e.join(labels.withColumnRenamed("vertex", "dst"), "dst")
            .groupBy(F.col("src").alias("vertex"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # most frequent neighbour label, smallest label on ties:
        # min_by over (-cnt, label) — integer count, string label,
        # both totally ordered identically in Spark and DuckDB
        winner = votes.groupBy("vertex").agg(
            F.min_by(
                "label",
                F.struct((-F.col("cnt")).alias("nc"),
                         F.col("label").alias("l")),
            ).alias("_new"))
        labels = (
            labels.select("vertex", F.col("label").alias("_prev"))
            .join(winner, "vertex", "left")
            .select(
                "vertex",
                F.coalesce("_new", "_prev").alias("label"),
                "_prev",
            )
            .localCheckpoint(eager=False)
        )
        done = i + 1
        if early_stop and done % check_every == 0 and done < iters:
            # ONE job per round (r6): the changed-label count IS the
            # action that materializes the round's lazy checkpoint, so
            # the old eager-checkpoint job disappears.  count_if
            # replaces the former limit(1).count(): the materializer
            # must scan every partition anyway, so the short-circuit
            # limit bought nothing and cost a separate job.
            changed = labels.agg(F.count(F.when(
                F.col("label") != F.col("_prev"), F.lit(1)))).first()[0]
            if changed == 0:
                break
    if stats is not None:
        stats["iterations"] = done
    return labels.select("vertex", "label")


def entity_communities(triples: DataFrame, iters: int = 5,
                       min_size: int = 2) -> DataFrame:
    """Communities of the emitted triple table's co-occurrence graph:
    LPA over the undirected cooccurs_with edges.  Returns
    (entity, community, community_size) for communities of at least
    ``min_size`` members, deterministic order (size desc, community,
    entity)."""
    pairs = triples.where(F.col("pred") == "cooccurs_with") \
        .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
    lab = label_propagation(pairs, iters=iters)
    sizes = lab.groupBy("label").agg(
        F.count(F.lit(1)).alias("community_size"))
    return (
        lab.join(sizes, "label")
        .where(F.col("community_size") >= min_size)
        .select(F.col("vertex").alias("entity"),
                F.col("label").alias("community"),
                "community_size")
        .orderBy(F.col("community_size").desc(), "community", "entity")
    )
