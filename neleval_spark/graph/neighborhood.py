"""k-hop neighborhood queries over the emitted triple table.

The KG the pipeline materializes (pipeline/triples.py) is only useful
if it can be *queried*; the canonical entity-centric query is "every
entity within k hops of these seeds" (entity cards, related-entity
panels, subgraph extraction for downstream training).  The reference
has no graph query layer (its KB involvement stops at the redirect
dict, reference tac.py:83-103); this is public-knowledge BFS algebra
expressed relationally.

Scale shape (triples is the 10^12-row table, seeds are few):

* the co-occurrence edge list is symmetrized once — a projection +
  union, no shuffle beyond the dedup aggregate;
* hop expansion is ONE equi-join per hop (frontier.node = edges.src)
  — k is small and fixed (2-3), so the loop is unrolled statically
  into a single plan, no lineage growth to truncate;
* the frontier starts broadcast-small and stays bounded by the
  k-hop ball; each hop anti-joins the visited set so already-reached
  nodes never re-expand (standard BFS layering — this is what keeps
  hop-2 from multiplying through hop-1 duplicates);
* hub safety: ``max_degree`` drops expansion THROUGH nodes whose
  degree exceeds the cap (the frontier row survives, its expansion
  is pruned) — same contract as linkgraph.host_cocitation's
  ``max_out`` guard: a celebrity entity with 10^7 partners would
  otherwise put the whole ball in one task's output. AQE skew-join
  splitting covers moderate skew below the cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["k_hop_neighbors", "cooccurrence_edges"]


def cooccurrence_edges(triples: DataFrame,
                       pred: str = "cooccurs_with") -> DataFrame:
    """Triple rows → symmetric distinct (src, dst) edge list.

    The triple table repeats a pair once per witnessing url; the
    dedup aggregate is the only exchange and combines map-side.
    """
    co = (triples.where(F.col("pred") == pred)
                 .select("subj", "obj").distinct())
    return (co.select(F.col("subj").alias("src"),
                      F.col("obj").alias("dst"))
              .unionByName(
                  co.select(F.col("obj").alias("src"),
                            F.col("subj").alias("dst"))))


def k_hop_neighbors(triples: DataFrame, seeds: DataFrame,
                    max_hops: int = 2,
                    pred: str = "cooccurs_with",
                    max_degree: int | None = None) -> DataFrame:
    """Min-hop BFS ball around ``seeds`` (column ``seed``).

    Returns (seed, entity, hops) for every entity reachable within
    ``max_hops`` co-occurrence hops, ``hops`` = minimum distance
    (the seed itself appears with hops=0).
    """
    edges = cooccurrence_edges(triples, pred=pred)
    if max_degree is not None:
        deg = edges.groupBy("src").agg(F.count("*").alias("_deg"))
        expandable = deg.where(F.col("_deg") <= max_degree) \
                        .select("src")
        edges = edges.join(expandable, "src")

    frontier = seeds.select(
        F.col("seed"), F.col("seed").alias("entity"),
        F.lit(0).alias("hops"))
    visited = frontier
    for h in range(1, max_hops + 1):
        nxt = (frontier.join(
                   edges, frontier["entity"] == edges["src"])
               .select("seed", F.col("dst").alias("entity"),
                       F.lit(h).alias("hops"))
               .distinct()
               .join(visited.select("seed", "entity"),
                     ["seed", "entity"], "left_anti"))
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited
