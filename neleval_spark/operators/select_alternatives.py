"""Gold-ambiguity resolution (reference: SelectAlternatives,
neleval/prepare.py:8-90).

For each gold span with multiple candidates, pick ONE by back-off
against the system's top candidates:

    1. the system's top candidate at the same span;
    2. any system top candidate in the same document (earliest-listed
       gold candidate wins);
    3. any system top candidate in the whole collection
       (earliest-listed);
    4. default: the first listed candidate.

Spark form (SURVEY.md §2.3 J7): posexplode the gold candidate lists,
three priority joins (span equi-join; semi-join against per-doc
distinct; semi-join against the global distinct broadcast), then pick
min(priority, pos) per gold mention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def select_alternatives(gold: DataFrame, system: DataFrame,
                        fields: tuple[str, ...] = ("eid",)) -> DataFrame:
    """Returns gold with each multi-candidate list reduced to one."""
    fields = list(fields)
    multi = gold.where(F.size("candidates") > 1)
    single = gold.where(F.size("candidates") <= 1)

    sys_top = system.select(
        "docid", "start", "end",
        *[F.col("candidates")[0][f].alias(f"__s_{f}") for f in fields],
    )

    exploded = multi.select(
        "docid", "start", "end",
        F.posexplode("candidates").alias("pos", "cand"),
    ).select(
        "docid", "start", "end", "pos",
        *[F.col("cand")[f].alias(f"__g_{f}") for f in fields],
    )

    def key_match(prefix_l, prefix_r):
        cond = None
        for f in fields:
            e = F.col(f"{prefix_l}_{f}").eqNullSafe(F.col(f"{prefix_r}_{f}"))
            cond = e if cond is None else cond & e
        return cond

    # tier 1: same span
    t1 = exploded.join(
        sys_top.withColumnRenamed("docid", "__sd")
               .withColumnRenamed("start", "__ss")
               .withColumnRenamed("end", "__se"),
        (F.col("docid") == F.col("__sd"))
        & (F.col("start") == F.col("__ss"))
        & (F.col("end") == F.col("__se"))
        & key_match("__g", "__s"),
        "left_semi",
    ).withColumn("tier", F.lit(1))

    # tier 2: same document
    doc_keys = sys_top.select(
        F.col("docid").alias("__sd"),
        *[F.col(f"__s_{f}") for f in fields]).distinct()
    t2 = exploded.join(
        doc_keys,
        (F.col("docid") == F.col("__sd")) & key_match("__g", "__s"),
        "left_semi",
    ).withColumn("tier", F.lit(2))

    # tier 3: whole collection (broadcast the distinct key set)
    coll_keys = F.broadcast(
        sys_top.select(*[F.col(f"__s_{f}") for f in fields]).distinct())
    t3 = exploded.join(coll_keys, key_match("__g", "__s"), "left_semi") \
        .withColumn("tier", F.lit(3))

    # tier 4: first listed
    t4 = exploded.where(F.col("pos") == 0).withColumn("tier", F.lit(4))

    # NB (matches reference back-off, prepare.py:74-86): within tier 1
    # the span match wins outright; tiers 2/3 prefer the
    # earliest-listed candidate; tier 2 beats tier 3 only per the
    # reference's loop order — a doc-match at any pos beats any
    # collection-match
    ranked = t1.unionByName(t2).unionByName(t3).unionByName(t4)
    w = Window.partitionBy("docid", "start", "end").orderBy(
        "tier", "pos")
    best = (
        ranked.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("docid", "start", "end", F.col("pos").alias("__pick"))
    )

    picked = (
        multi.join(best, ["docid", "start", "end"])
        .withColumn(
            "candidates",
            F.array(F.element_at(F.col("candidates"),
                                 F.col("__pick").cast("int") + 1)))
        .drop("__pick")
    )
    return single.unionByName(picked.select(*single.columns))
