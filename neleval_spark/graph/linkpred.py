"""Neighborhood link-prediction features for the constructed KG
(Liben-Nowell & Kleinberg 2003, "The link prediction problem for
social networks"): for vertex pairs at distance 2, the classic
triad-closure scores —

* ``common_neighbors``  |Γ(u) ∩ Γ(w)|
* ``jaccard``           |Γ(u) ∩ Γ(w)| / |Γ(u) ∪ Γ(w)|
* ``adamic_adar``       Σ_{z ∈ Γ(u) ∩ Γ(w)} 1 / ln(deg z)

used as candidate-edge features (which co-occurrence edges are
probably missing) and as training features for a learned link
scorer (the counterpart of ``graph.ranking``'s evaluation side).

Scale shape (10^9+ edges):

* Pairs are enumerated as WEDGES at their common neighbour z — the
  standard self-join of the adjacency on z.  That is quadratic in
  deg(z), so hub centers are the scale hazard: a 10^7-degree entity
  would emit 10^14 wedges while contributing ~1/ln(10^7) ≈ 0.06 per
  pair.  ``max_center_degree`` therefore EXCLUDES high-degree
  centers from wedge enumeration (the documented approximation
  everyone ships; excluded-center count is surfaced via ``stats`` —
  the repo's no-silent-caps rule — and their pairs lose only the
  hub's negligible Adamic-Adar mass, though common_neighbors /
  jaccard for pairs whose ONLY witnesses are hubs are dropped).
* The Adamic-Adar SUM is an ordered fold over the z-sorted witness
  list (collect_list + array_sort), so the double summation order is
  pinned — bit-stable across engines and partitionings (the
  mine_bitext convention); ln() itself may differ from another
  engine's libm in the last ulp, which 6dp rounding absorbs.
* Everything else is equi-joins on vertex keys and one groupBy on
  the pair key.

No reference counterpart (public graph-mining practice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["link_prediction"]


def link_prediction(edges: DataFrame, src_col: str = "src",
                    dst_col: str = "dst",
                    max_center_degree: int | None = None,
                    include_existing: bool = False,
                    stats: dict | None = None) -> DataFrame:
    """Score all distance-2 pairs of the undirected simple graph:
    ``(u, w, common_neighbors, jaccard, adamic_adar)`` with u < w.
    Existing edges are excluded unless ``include_existing=True``
    (include them to build labelled training data: existing = 1).

    ``max_center_degree`` bounds wedge fan-out at hub centers (see
    module docstring); ``stats`` receives ``n_centers_excluded``."""
    e = (edges.select(
        F.least(F.col(src_col), F.col(dst_col)).alias("a"),
        F.greatest(F.col(src_col), F.col(dst_col)).alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct())
    adj = (e.select(F.col("a").alias("z"), F.col("b").alias("n"))
           .unionByName(
               e.select(F.col("b").alias("z"),
                        F.col("a").alias("n"))))
    deg = adj.groupBy("z").agg(F.count(F.lit(1)).alias("deg"))
    centers = adj.join(deg, "z")
    if max_center_degree is not None:
        if stats is not None:
            stats["n_centers_excluded"] = (
                deg.where(F.col("deg") > max_center_degree).count())
        centers = centers.where(F.col("deg") <= max_center_degree)
    w1 = centers.select("z", F.col("n").alias("u"),
                        F.col("deg").alias("_dz"))
    w2 = centers.select("z", F.col("n").alias("w"))
    wedges = (w1.join(w2, "z").where(F.col("u") < F.col("w"))
              .select("u", "w", "z",
                      (F.lit(1.0) / F.log(F.col("_dz").cast("double")))
                      .alias("_inv")))
    scored = (wedges.groupBy("u", "w").agg(
        F.count(F.lit(1)).alias("common_neighbors"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("z", "_inv"))),
            F.lit(0.0), lambda acc, x: acc + x["_inv"])
        .alias("_aa")))
    du = deg.select(F.col("z").alias("u"), F.col("deg").alias("_du"))
    dw = deg.select(F.col("z").alias("w"), F.col("deg").alias("_dw"))
    out = (scored.join(du, "u").join(dw, "w")
           .select(
               "u", "w", "common_neighbors",
               F.round(F.col("common_neighbors")
                       / (F.col("_du") + F.col("_dw")
                          - F.col("common_neighbors")), 6)
               .alias("jaccard"),
               F.round("_aa", 6).alias("adamic_adar")))
    if not include_existing:
        out = out.join(e.select(F.col("a").alias("u"),
                                F.col("b").alias("w")),
                       ["u", "w"], "left_anti")
    return out
