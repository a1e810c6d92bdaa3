"""Negative sampling for knowledge-graph-embedding training data
(Bordes et al. 2013, "Translating Embeddings for Modeling
Multi-relational Data" — the TransE corruption protocol): for every
positive triple (subj, pred, obj), emit ``n_neg`` corrupted triples
whose object (or subject) is replaced by a pseudo-random entity, and
drop corruptions that happen to be TRUE triples (the standard
"filtered" setting, Bordes' §3; we drop rather than resample so the
output is a pure function of the input — resampling loops are
driver-side and nondeterministic under retries).

Everything is driven by the engine-agnostic polynomial hash, so the
whole sample — which entity corrupts which triple — is deterministic
across partitionings, re-runs, and engines (exact DuckDB oracle).

Scale shape (10^10 triples, 10^8 entities; audited in PLANS.md):

* :func:`entity_ids` assigns dense ids 0..E-1 with the two-phase
  rank trick — hash-partition entities into ``n_parts`` buckets,
  rank WITHIN each bucket (bounded window: ~E/n_parts rows per
  partition), add per-bucket cumulative offsets (an ``n_parts``-row
  table, window over n_parts rows only, then broadcast) — never a
  global single-partition window.
* :func:`negative_samples` explodes j=0..n_neg-1 in-row, computes
  the corrupting id as hash(s,p,o,j) mod E (E rides in as ONE
  broadcast scalar row — the BM25 totals pattern, no driver
  collect), equi-joins the entity dimension on id (AQE picks
  broadcast when E is small), and anti-joins the corrupted key
  against the positive set — both shuffles are plain equi-joins on
  uniform keys (ids are hash-derived; the anti-join key is the
  triple key, whose skew is the KG's own and already handled by the
  merge path's AQE note).

No reference counterpart (the reference is an evaluation engine);
the protocol is public KG-embedding practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textops import token_hash

_SEP = "\x1f"


def entity_ids(kg: DataFrame, n_parts: int = 1024) -> DataFrame:
    """Dense, deterministic entity ids 0..E-1 over the KG's subject
    and object vocabulary: ``(entity, entity_id)``.

    Ordering is (hash-bucket, entity-hash, entity) — a fixed
    pseudo-random permutation, NOT lexicographic (neighbours in id
    space are unrelated entities, which is what sampling wants).
    The two-phase rank itself is :func:`~neleval_spark.functions.
    ranks.dense_index` (ungrouped: the whole vocabulary is one
    group, its n_parts-row offsets table broadcast).
    """
    from ..functions.ranks import dense_index

    ents = (kg.select(F.col("subj").alias("entity"))
            .union(kg.select(F.col("obj").alias("entity")))
            .distinct())
    return dense_index(ents, [], "entity", n_sub=n_parts,
                       idx_col="entity_id") \
        .select("entity", "entity_id")


def negative_samples(kg: DataFrame, n_neg: int = 4,
                     corrupt: str = "obj",
                     n_parts: int = 1024) -> DataFrame:
    """Filtered negative samples: one row per surviving corruption,
    ``(subj, pred, obj, j, neg)`` where ``neg`` replaces the
    ``corrupt`` side ("obj" or "subj") of the positive triple and
    ``j`` is the corruption index (0..n_neg-1; rows whose corruption
    collided with a true triple are dropped, so a triple can carry
    fewer than n_neg negatives — count them, don't assume).

    The corrupting entity for (s,p,o,j) is
    ``entity_id = hash(s‹US›p‹US›o‹US›j) mod E`` — deterministic and
    engine-agnostic (modulo bias over 2^31-1 is ≤ E/2^31, irrelevant
    for training negatives).  ``neg == the original value`` is
    impossible in the output: that corruption IS a true triple and
    the filter removes it.
    """
    if corrupt not in ("subj", "obj"):
        raise ValueError(f"corrupt must be 'subj' or 'obj': {corrupt}")
    if n_neg < 1:
        # ANSI sequence(0, -1) yields [0, -1], not [] — refuse
        raise ValueError(f"n_neg must be >= 1: {n_neg}")

    ids = entity_ids(kg, n_parts=n_parts)
    e_total = ids.agg(F.count("*").alias("_e"))

    base = kg.select("subj", "pred", "obj")
    idx = F.explode(F.sequence(F.lit(0), F.lit(n_neg - 1))).alias("j")
    pick = token_hash(
        F.concat_ws(_SEP, "subj", "pred", "obj",
                    F.col("j").cast("string"))) % F.col("_e")
    cand = (base.select("subj", "pred", "obj", idx)
            .crossJoin(F.broadcast(e_total))
            .select("subj", "pred", "obj", "j",
                    pick.alias("entity_id"))
            .join(ids, "entity_id")
            .select("subj", "pred", "obj", "j",
                    F.col("entity").alias("neg")))

    truth = base.select(*[F.col(c).alias(f"_t_{c}")
                          for c in ("subj", "pred", "obj")])
    c_subj = F.col("neg") if corrupt == "subj" else F.col("subj")
    c_obj = F.col("neg") if corrupt == "obj" else F.col("obj")
    cond = ((c_subj == F.col("_t_subj"))
            & (F.col("pred") == F.col("_t_pred"))
            & (c_obj == F.col("_t_obj")))
    return cand.join(truth, cond, "left_anti")
