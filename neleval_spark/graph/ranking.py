"""Link-prediction ranking evaluation for KG-embedding training
(Bordes et al. 2013 §4, the standard FILTERED MRR / Hits@k
protocol): for every test triple (subj, pred, obj), rank the TRUE
object among all candidate entities under a scoring function; in the
filtered setting, candidates that form a KNOWN true triple with
(subj, pred) are not counted as errors.

Scale shape (10^4 test triples × 10^8 entities — the classic
formulation sorts a full |T|×|E| score matrix):

* NO per-test sort and NO shuffled score matrix.  The filtered rank
  is computed by COUNTING:
  ``rank = 1 + #{e : better(e)} − #{known true e′ ≠ obj : better(e′)}``.
  The first count streams the entity dimension past the (small,
  broadcast) test set — a broadcast join whose CONDITION is the
  "better" predicate, so losing candidates are dropped in place and
  partial aggregation combines map-side; the |T|×|E| product is
  scanned once and never exchanged.  The second count is a plain
  equi-join on (subj, pred) against the known-triples table —
  per-key fan-out is the out-degree of (s, p), the KG's own skew.
* "better" is a deterministic TOTAL order — (score DESC, entity ASC)
  — so hash-score ties cannot reorder across engines, re-runs or
  partitionings.

The default scorer is the engine-agnostic polynomial hash of
s‹sep›p‹sep›e‹sep›salt — pure plumbing with an exact DuckDB replay;
a learned scorer drops in via ``score_fn`` (any column expression
over (subj, pred, entity), e.g. a lookup against broadcast embedding
tables or a pre-scored column).  No reference counterpart (the
reference is an entity-linking evaluation engine); the protocol is
public KG-embedding practice.
"""

from __future__ import annotations

from typing import Callable, Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textops import token_hash

_SEP = "\x1f"

__all__ = ["ranking_eval", "ranking_summary"]


def _hash_scorer(salt: str) -> Callable[[Column, Column, Column], Column]:
    def score(s: Column, p: Column, e: Column) -> Column:
        return token_hash(F.concat_ws(_SEP, s, p, e, F.lit(salt)))
    return score


def ranking_eval(test: DataFrame, known: DataFrame,
                 entities: DataFrame | None = None,
                 score_fn: Callable[[Column, Column, Column],
                                    Column] | None = None,
                 salt: str = "#rank") -> DataFrame:
    """Per-test-triple filtered object rank: ``(subj, pred, obj,
    rank, rr)`` with ``rank`` ≥ 1 and ``rr = round(1/rank, 6)``.

    ``test`` and ``known`` are (subj, pred, obj) frames; ``known``
    must be DISTINCT (kg_merge output is — duplicates would
    double-subtract) and should CONTAIN the test triples (the
    protocol filters against train ∪ valid ∪ test).  ``entities``
    defaults to the distinct subj ∪ obj vocabulary of ``known``.
    """
    if entities is None:
        entities = (known.select(F.col("subj").alias("entity"))
                    .unionByName(known.select(F.col("obj")
                                              .alias("entity")))
                    .distinct())
    score = score_fn or _hash_scorer(salt)

    t = test.select(
        "subj", "pred", "obj",
        score(F.col("subj"), F.col("pred"), F.col("obj"))
        .alias("_st"))

    def better(cand: Column) -> Column:
        cs = score(F.col("subj"), F.col("pred"), cand)
        return (cs > F.col("_st")) | ((cs == F.col("_st"))
                                      & (cand < F.col("obj")))

    raw = (entities.join(F.broadcast(t), on=better(F.col("entity")))
           .groupBy("subj", "pred", "obj")
           .agg(F.count(F.lit(1)).alias("_raw")))
    kb = (t.join(known.select("subj", "pred",
                              F.col("obj").alias("_kobj")),
                 ["subj", "pred"])
          .where(F.col("_kobj") != F.col("obj"))
          .where(better(F.col("_kobj")))
          .groupBy("subj", "pred", "obj")
          .agg(F.count(F.lit(1)).alias("_kb")))
    rank = (F.lit(1).cast("long")
            + F.coalesce(F.col("_raw"), F.lit(0)).cast("long")
            - F.coalesce(F.col("_kb"), F.lit(0)).cast("long"))
    return (t.join(raw, ["subj", "pred", "obj"], "left")
            .join(kb, ["subj", "pred", "obj"], "left")
            .select("subj", "pred", "obj", rank.alias("rank"))
            .withColumn("rr",
                        F.round(F.lit(1.0) / F.col("rank"), 6)))


def ranking_summary(ranked: DataFrame,
                    ks: Iterable[int] = (1, 3, 10)) -> DataFrame:
    """One-row corpus summary over :func:`ranking_eval` output:
    ``(n, mrr, hits_1, hits_3, hits_10, …)``.  Hits ratios are exact
    integer-count divisions (engine-stable); MRR averages the
    6dp-rounded reciprocals."""
    aggs = [F.count(F.lit(1)).alias("n"),
            F.round(F.avg("rr"), 6).alias("mrr")]
    for k in ks:
        aggs.append(
            F.round(F.sum((F.col("rank") <= int(k)).cast("long"))
                    / F.count(F.lit(1)), 6).alias(f"hits_{int(k)}"))
    return ranked.agg(*aggs)
