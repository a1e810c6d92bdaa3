"""Association scoring (PMI) over emitted co-occurrence triples.

The KG-construction pipeline's ``cooccurs_with`` edges are raw
within-sentence pair observations; downstream consumers (entity
relatedness, edge pruning, salience features) want them weighted by
pointwise mutual information:

    pmi(x, y) = log( p(x, y) / (p(x) p(y)) )
              = log( c_xy * N / (c_x * c_y) )

with ``c_x`` = documents mentioning x (from ``mentioned_in`` triples),
``c_xy`` = documents where the pair co-occurs, ``N`` = total linked
documents.

Cross-engine exactness: the log is monotone, so everything that
matters for ranking/pruning lives in the rational
``c_xy * N / (c_x * c_y)`` — emitted as the exact scaled integer
``pmi_scaled = (c_xy * N * scale) div (c_x * c_y)`` (integer floor
division; both engines agree bit-for-bit, unlike last-ulp ``ln``).
Consumers who want nats apply ``log(pmi_scaled / scale)`` themselves.

Scale shape: two aggregations (pair counts, entity counts) — the pair
exchange is the big one and is keyed by the pair itself, so hub
entities spread across their partner space rather than hot-keying a
single reducer; the entity table joins back **broadcast** (entity
vocabularies are orders of magnitude smaller than pair sets), and
``N`` rides along as an in-plan broadcast scalar (same pattern as
PageRank's dangling mass — no driver collect).

No reference counterpart (the reference evaluates links; it does not
build graphs): cites the north rule's triple materialization +
graph-analytics surface instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_scores(triples: DataFrame, scale: int = 1_000_000,
                       broadcast_entities: bool = True) -> DataFrame:
    """Score ``cooccurs_with`` pairs by scaled PMI.

    ``triples`` is the :func:`~neleval_spark.pipeline.triples
    .emit_triples` output schema ``(subj, pred, obj, url, ...)``.
    Returns one row per co-occurring pair: ``(subj, obj, c_pair,
    c_subj, c_obj, n_docs, pmi_scaled)``.

    ``pmi_scaled`` is exact 64-bit integer arithmetic; the product
    ``c_pair * n_docs * scale`` must stay under 2^63 (with the default
    ``scale`` that bounds ``c_pair * n_docs`` at ~9.2e12 — lower
    ``scale`` for corpora beyond that).

    Set ``broadcast_entities=False`` to let the planner pick the join
    strategy when the entity vocabulary itself is too large to ship.
    """
    ment = (triples.where(F.col("pred") == "mentioned_in")
            .select(F.col("subj").alias("eid"), F.col("obj").alias("url")))
    occ = ment.groupBy("eid").agg(F.countDistinct("url").alias("c_ent"))
    n_docs = ment.agg(F.countDistinct("url").alias("n_docs"))

    pairs = (triples.where(F.col("pred") == "cooccurs_with")
             .groupBy("subj", "obj")
             .agg(F.countDistinct("url").alias("c_pair")))

    occ_s = occ.select(F.col("eid").alias("subj"),
                       F.col("c_ent").alias("c_subj"))
    occ_o = occ.select(F.col("eid").alias("obj"),
                       F.col("c_ent").alias("c_obj"))
    if broadcast_entities:
        occ_s, occ_o = F.broadcast(occ_s), F.broadcast(occ_o)

    return (pairs.join(occ_s, "subj").join(occ_o, "obj")
            .crossJoin(F.broadcast(n_docs))
            .withColumn(
                "pmi_scaled",
                F.expr(f"c_pair * n_docs * CAST({int(scale)} AS BIGINT) "
                       f"div (c_subj * c_obj)"))
            .select("subj", "obj", "c_pair", "c_subj", "c_obj",
                    "n_docs", "pmi_scaled"))
