"""Cross-document NIL canonicalization.

Mentions with no KB candidate must share a cluster id across the whole
corpus when they refer to the same unseen entity. Relational form: a
bipartite graph mention-node ↔ surface-key-node, clustered with the
shared distributed connected-components utility (salted/star-contracted
— the same machinery CEAF uses, SURVEY.md §2.4 A8). The emitted label
is ``NIL`` + sha1(min surface key of the component), so the id is a
pure function of the cluster contents — stable across runs, cluster
sizes and executor counts (and equal to the gold generator's label for
single-surface clusters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import connected_components


def surface_key(col):
    return F.replace(F.lower(F.trim(col)), F.lit(" "), F.lit("_"))


def canonicalize_nils(mentions: DataFrame) -> DataFrame:
    """Assign NIL cluster ids to unlinked mentions.

    Input: mentions with (url, start, end, surface, eid, ...) where
    eid IS NULL marks the NIL path. Output: same rows with eid
    replaced by the cluster label and type defaulted.
    """
    nils = mentions.where(F.col("eid").isNull())
    linked = mentions.where(F.col("eid").isNotNull())

    mkey = F.concat_ws("\x01", F.lit("m"), F.col("url"),
                       F.col("start").cast("string"))
    skey = F.concat_ws("\x01", F.lit("s"), surface_key(F.col("surface")))
    edges = nils.select(mkey.alias("src"), skey.alias("dst"))

    comps = connected_components(edges)
    # component label → NIL id derived from the minimum surface key in
    # the component ("s\x01..." sorts after "m\x01...", so recover the
    # min surface by joining surface vertices)
    surf_vertices = (
        nils.select(skey.alias("vertex"),
                    surface_key(F.col("surface")).alias("sk"))
        .distinct()
        .join(comps, "vertex")
        .groupBy("component")
        .agg(F.min("sk").alias("min_sk"))
        .select(
            "component",
            F.concat(F.lit("NIL"),
                     F.substring(F.sha1(F.col("min_sk")), 1, 10))
            .alias("nil_id"),
        )
    )
    mention_comp = comps.join(surf_vertices, "component").select(
        F.col("vertex"), F.col("nil_id"))

    nils_labelled = (
        nils.withColumn("vertex", mkey)
        .join(mention_comp, "vertex", "left")
        .withColumn("eid", F.coalesce(F.col("nil_id"), F.lit("NIL")))
        .withColumn("type", F.coalesce(F.col("type"), F.lit("ORG")))
        .withColumn("score", F.coalesce(F.col("score"), F.lit(1.0)))
        .drop("vertex", "nil_id")
    )
    return linked.unionByName(nils_labelled.select(*linked.columns))
