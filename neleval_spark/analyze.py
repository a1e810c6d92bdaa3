"""Error analysis: full-outer match join + error-label taxonomy +
ranked summary (reference: neleval/analyze.py).

``LinkingError.label`` taxonomy (analyze.py:16-31):
extra / missing / correct nil / correct link / nil-as-link /
link-as-nil / wrong-link, computed over the strong_mention_match
alignment (span equi-join, full outer — Measure.get_matches,
annotation.py:380-402).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .measures.catalog import get_measure
from .measures.sets import project_measure


def error_table(sys_df: DataFrame, gold_df: DataFrame) -> DataFrame:
    """One row per aligned/unaligned mention with its error label.

    Columns: docid, start, end, gold_kbid, system_kbid, label.
    """
    spec = get_measure("strong_mention_match")
    g = project_measure(gold_df, spec, extra=["kbid"]) \
        .dropDuplicates(["docid", "start", "end"]) \
        .withColumnRenamed("kbid", "gold_kbid") \
        .withColumn("_g", F.lit(1))
    s = project_measure(sys_df, spec, extra=["kbid"]) \
        .dropDuplicates(["docid", "start", "end"]) \
        .withColumnRenamed("kbid", "system_kbid") \
        .withColumn("_s", F.lit(1))

    j = g.join(s, ["docid", "start", "end"], "full_outer")
    label = (
        F.when(F.col("_g").isNull(), F.lit("extra"))
        .when(F.col("_s").isNull(), F.lit("missing"))
        .when(F.col("gold_kbid").isNull() & F.col("system_kbid").isNull(),
              F.lit("correct nil"))
        .when(F.col("gold_kbid") == F.col("system_kbid"),
              F.lit("correct link"))
        .when(F.col("gold_kbid").isNull(), F.lit("nil-as-link"))
        .when(F.col("system_kbid").isNull(), F.lit("link-as-nil"))
        .otherwise(F.lit("wrong-link"))
    )
    return j.select("docid", "start", "end", "gold_kbid", "system_kbid",
                    label.alias("label"))


def error_summary(sys_df: DataFrame, gold_df: DataFrame,
                  unique: bool = False) -> DataFrame:
    """Ranked label counts (reference: Analyze --summary,
    analyze.py:75-78; --unique dedups identical (doc, gold, sys)
    triples first, :64-72)."""
    errors = error_table(sys_df, gold_df)
    if unique:
        errors = errors.dropDuplicates(
            ["docid", "gold_kbid", "system_kbid", "label"])
    return (
        errors.groupBy("label")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.col("count").desc(), F.col("label"))
    )
