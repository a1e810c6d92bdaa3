"""Margin-based bitext / comparable-corpus mining (Artetxe &
Schwenk 2019, "Margin-based Parallel Corpus Mining with Multilingual
Sentence Embeddings" — the LASER/CCMatrix recipe): candidate
cross-lingual pairs are scored not by raw cosine (which is
hubness-biased: some embeddings are near EVERYTHING) but by the
RATIO margin

    margin(x, y) = cos(x, y) / ((avgNN_k(x) + avgNN_k(y)) / 2)

where avgNN_k is the mean cosine of each side's k nearest
cross-side candidates.  Pairs above a threshold — optionally also
mutual-best in both directions ("intersection" strategy, §4.3) —
are emitted as mined parallel data.

Scale shape (10^9 sentences per side):

* Candidate generation is the LSH bucket equi-join from
  ``similarity.lsh_signatures`` (random-hyperplane tables) — never
  an all-pairs product; the within-bucket pair set is the same one
  ``ann_lsh_topk`` re-ranks.
* Per-side top-k neighbourhoods come from a window over the
  candidate pairs (partition key = one side's id — bounded by the
  bucket fan-in, not the corpus), and the neighbourhood MEAN is an
  ordered fold over the sorted (rank, cos) structs, so the double
  summation order is pinned — bit-identical across engines and
  partitionings, which keeps the margin THRESHOLD a stable row
  filter (an unordered SQL AVG could flip boundary pairs per run).
* Everything downstream is equi-joins on pair keys; the mutual-best
  filter is two row_number windows over the same pair set.

No reference counterpart (public MT-data practice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import _dot, _norm, lsh_signatures

__all__ = ["mine_bitext"]


def _ordered_mean(rk_col: str, val_col: str) -> F.Column:
    """Deterministic mean: fold the rank-sorted values left-to-right
    (array_sort on (rk, val) structs orders by rk), then divide by
    the count — the list_reduce-replayable shape."""
    arr = F.array_sort(F.collect_list(F.struct(rk_col, val_col)))
    return (F.aggregate(arr, F.lit(0.0),
                        lambda acc, x: acc + x[val_col])
            / F.size(arr))


def mine_bitext(src: DataFrame, tgt: DataFrame, k: int = 4,
                threshold: float = 1.0, mutual: bool = True,
                id_s: str = "sid", id_t: str = "tid",
                vec_s: str = "sv", vec_t: str = "tv",
                n_tables: int = 4, n_planes: int = 8) -> DataFrame:
    """Mine aligned pairs between two embedded corpora: returns
    ``(sid, tid, cos, margin)`` (both scores rounded to 6dp) for
    candidate pairs whose ratio margin clears ``threshold``, ordered
    semantics only — callers sort.  ``mutual=True`` additionally
    requires the pair to be each side's margin-argmax (ties broken
    by the other side's id), the paper's highest-precision strategy.

    ``k`` bounds each side's neighbourhood; sides with FEWER than k
    candidates use what they have (the mean is over present
    neighbours, as in the reference implementation)."""
    ss = lsh_signatures(src, id_s, vec_s, n_tables, n_planes) \
        .withColumnRenamed("id", id_s)
    ts = lsh_signatures(tgt, id_t, vec_t, n_tables, n_planes) \
        .withColumnRenamed("id", id_t)
    pairs = (ss.join(ts, ["table", "sig"])
             .select(id_s, id_t).distinct())
    # per-row norm staging below the joins (PLANS.md "cosine family")
    cos = _dot(F.col(vec_s), F.col(vec_t)) / (
        F.col("_sn") * F.col("_tn"))
    scored = (pairs
              .join(src.select(id_s, vec_s).withColumn(
                  "_sn", _norm(F.col(vec_s))), id_s)
              .join(tgt.select(id_t, vec_t).withColumn(
                  "_tn", _norm(F.col(vec_t))), id_t)
              .select(id_s, id_t, cos.alias("_cos")))

    w_s = Window.partitionBy(id_s).orderBy(F.col("_cos").desc(),
                                           F.col(id_t).asc())
    w_t = Window.partitionBy(id_t).orderBy(F.col("_cos").desc(),
                                           F.col(id_s).asc())
    ranked = (scored
              .withColumn("_rk_s", F.row_number().over(w_s))
              .withColumn("_rk_t", F.row_number().over(w_t)))
    avg_s = (ranked.where(F.col("_rk_s") <= k).groupBy(id_s)
             .agg(_ordered_mean("_rk_s", "_cos").alias("_avg_s")))
    avg_t = (ranked.where(F.col("_rk_t") <= k).groupBy(id_t)
             .agg(_ordered_mean("_rk_t", "_cos").alias("_avg_t")))
    m = (ranked.join(avg_s, id_s).join(avg_t, id_t)
         .withColumn("margin",
                     F.col("_cos") * 2.0
                     / (F.col("_avg_s") + F.col("_avg_t"))))
    out = m.where(F.col("margin") >= float(threshold))
    if mutual:
        bw_s = Window.partitionBy(id_s).orderBy(
            F.col("margin").desc(), F.col(id_t).asc())
        bw_t = Window.partitionBy(id_t).orderBy(
            F.col("margin").desc(), F.col(id_s).asc())
        out = (out
               .withColumn("_b_s", F.row_number().over(bw_s))
               .withColumn("_b_t", F.row_number().over(bw_t))
               .where((F.col("_b_s") == 1) & (F.col("_b_t") == 1)))
    return out.select(id_s, id_t,
                      F.round("_cos", 6).alias("cos"),
                      F.round("margin", 6).alias("margin"))
