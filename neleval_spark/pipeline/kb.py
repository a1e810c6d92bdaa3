"""KB profile materialization: linked mentions → one row per entity.

The construction pipeline's end product besides the triple table: a
queryable knowledge-base profile per entity id —

    (eid, canonical_name, aliases, n_aliases, entity_type,
     n_mentions, n_docs [, degree, n_pages])

* ``canonical_name`` — most frequent surface form; ties broken by
  lexicographically smallest surface (deterministic across engines
  and partitionings: integer counts, total tie-break order).
* ``aliases`` — the top-``max_aliases`` surfaces by (count desc,
  surface asc), '|'-joined (string, not array, so downstream
  cross-engine comparisons are order-exact by construction).
* ``entity_type`` — majority vote over mention-level types, same
  tie-break discipline.
* ``degree`` / ``n_pages`` — optional graph-side enrichments from the
  emitted triple table (distinct co-occurrence partners, distinct
  pages mentioning the entity).

Reference parity: the reference's evaluation side consumes a KB only
as a redirect/alias dict (reference tac.py:83-103); profile
construction is the forward direction this engine adds.

Scale shape (the whole point — mentions is the 10^12-row table):

1. ONE mention-scale exchange: ``groupBy(eid, surface, entity_type)``
   with map-side combine — ships one row per distinct triple of keys
   per partition, not one per mention.
2. Everything after step 1 operates on *surface-scale* tables
   (distinct (eid, surface[, type]) combos — orders of magnitude
   smaller, bounded by vocabulary not corpus size).
3. Per-entity top-k aliases use a two-level salted top-k: partial
   top-k per (eid, salt) bucket, then a merge of ≤ salt_buckets
   arrays of ≤ k elements — no single task ever materializes a hub
   entity's full alias list (a plain window/collect_list would ship
   every distinct surface of a hub entity to one task).
4. ``n_docs`` is its own aggregate (count distinct url per eid) —
   Spark plans it as the standard two-stage partial-distinct expand.
5. Triple-side enrichments aggregate the (already entity-pair-scale)
   triple table and broadcast-or-SMJ join on eid at entity scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["build_kb_profiles"]


def _neg_rank(n_col):
    # min_by / array_sort orderings want "count desc, surface asc";
    # counts are longs so the descending half is just negation.
    return (-F.col(n_col)).alias("neg_n")


def build_kb_profiles(
    mentions: DataFrame,
    triples: DataFrame | None = None,
    max_aliases: int = 8,
    salt_buckets: int = 32,
    reuse: bool = True,
) -> DataFrame:
    """Linked mentions (url, surface, eid, entity_type) → KB profiles.

    ``triples``: optional (subj, pred, obj) table from
    ``pipeline.triples.emit_triples`` — adds ``degree`` (distinct
    cooccurs_with partners) and ``n_pages`` (distinct mentioned_in
    objects). Entities present in mentions but absent from the triple
    table get 0s (left join + coalesce).
    """
    m = mentions.where(F.col("eid").isNotNull())

    # -- stage 1: the single mention-scale exchange ------------------
    pair = m.groupBy("eid", "surface", "entity_type").agg(
        F.count("*").alias("n"))
    # multi-consumer surface-scale frame; tiny relative to mentions.
    # ``reuse=False`` skips the persist for one-shot small-input
    # callers that cannot manage the handle's lifetime (the driver
    # correctness gate runs under a cache-leak assertion).
    if reuse:
        pair = pair.persist()

    # -- per-(eid, surface) counts → canonical name + aliases --------
    surf = pair.groupBy("eid", "surface").agg(F.sum("n").alias("n"))

    ranked = surf.select(
        "eid", "surface", "n",
        F.pmod(F.xxhash64("surface"), F.lit(salt_buckets))
         .alias("salt"))
    # partial top-k inside each salt bucket: sort the (neg_n, surface)
    # structs and slice — array_sort on structs is lexicographic over
    # the fields, exactly the (count desc, surface asc) order we want
    partial = ranked.groupBy("eid", "salt").agg(
        F.slice(
            F.array_sort(F.collect_list(
                F.struct(_neg_rank("n"), F.col("surface")))),
            1, max_aliases).alias("top"))
    alias_tab = partial.groupBy("eid").agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("top"))),
            1, max_aliases).alias("top"))
    alias_tab = alias_tab.select(
        "eid",
        F.element_at(F.col("top"), 1)["surface"]
         .alias("canonical_name"),
        F.concat_ws(
            "|", F.transform(F.col("top"), lambda s: s["surface"]))
         .alias("aliases"),
        F.size("top").alias("n_top_aliases"),
    )

    # -- per-(eid, type) counts → majority type ----------------------
    typed = pair.groupBy("eid", "entity_type").agg(
        F.sum("n").alias("n"))
    type_tab = typed.groupBy("eid").agg(
        F.min_by(
            "entity_type",
            F.struct(_neg_rank("n"), F.col("entity_type")))
         .alias("entity_type"))

    # -- totals -------------------------------------------------------
    totals = pair.groupBy("eid").agg(
        F.sum("n").alias("n_mentions"),
        F.count_distinct("surface").alias("n_aliases"))
    docs = m.groupBy("eid").agg(
        F.count_distinct("url").alias("n_docs"))

    prof = (totals
            .join(alias_tab, "eid")
            .join(type_tab, "eid")
            .join(docs, "eid"))

    if triples is not None:
        co = triples.where(F.col("pred") == "cooccurs_with")
        deg = (co.select(F.col("subj").alias("eid"),
                         F.col("obj").alias("partner"))
                 .unionByName(
                     co.select(F.col("obj").alias("eid"),
                               F.col("subj").alias("partner")))
                 .groupBy("eid")
                 .agg(F.count_distinct("partner").alias("degree")))
        pages = (triples.where(F.col("pred") == "mentioned_in")
                 .groupBy(F.col("subj").alias("eid"))
                 .agg(F.count_distinct("obj").alias("n_pages")))
        prof = (prof.join(deg, "eid", "left")
                    .join(pages, "eid", "left")
                    .na.fill({"degree": 0, "n_pages": 0}))

    out = prof.select(
        "eid", "canonical_name", "aliases", "n_aliases",
        "entity_type", "n_mentions", "n_docs",
        *(["degree", "n_pages"] if triples is not None else []))
    # the persist above fans into 3 consumers of `pair`; hand the
    # handle to callers that manage lifetimes the same way
    # build_mentions does
    out._materialized_deps = [pair] if reuse else []
    return out
