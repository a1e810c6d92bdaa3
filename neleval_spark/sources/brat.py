"""brat directory reader (reference: BratReader, neleval/brat.py:63-115).

A directory of ``*.ann`` standoff files: ``T`` lines are mentions
(``Tid <TAB> TYPE start end <TAB> name``), ``N`` lines normalizations
(``Nid <TAB> Reference Tid KBID``). Spark form: ``spark.read.text``
over the glob + ``input_file_name()`` → split T and N rows → equi-join
on (doc, annot_id); KB ids get the Wikipedia: namespace stripped,
percent-decoded, then the usual link normalization.
"""

from __future__ import annotations

from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from ..operators.normalize import (
    derive_mention_columns, normalise_link_col, with_is_first)

_unquote_udf = pandas_udf(
    lambda s: s.map(lambda x: unquote(x) if x is not None else None),
    returnType=StringType())


def read_brat(spark: SparkSession, dir_path: str,
              mapping: DataFrame | None = None,
              score: float = 1.0) -> DataFrame:
    raw = spark.read.text(f"{dir_path}/*.ann").select(
        F.regexp_replace(
            F.element_at(F.split(F.input_file_name(), "/"), -1),
            r"\.ann$", "").alias("docid"),
        F.col("value"),
    )

    t = raw.where(F.col("value").startswith("T")).select(
        "docid",
        F.split(F.col("value"), "\t").alias("p"),
    ).select(
        "docid",
        F.col("p")[0].alias("annot_id"),
        F.split(F.col("p")[1], " ").alias("m"),
    ).select(
        "docid", "annot_id",
        F.col("m")[0].alias("type"),
        F.col("m")[1].cast("long").alias("start"),
        F.col("m")[2].cast("long").alias("end"),
    )

    n = raw.where(F.col("value").startswith("N")).select(
        "docid",
        F.split(F.col("value"), "\t").alias("p"),
    ).select(
        "docid",
        F.split(F.col("p")[1], " ").alias("r"),
    ).select(
        "docid",
        F.col("r")[1].alias("annot_id"),
        F.col("r")[2].alias("kb_id"),
    )
    # strip 'Wikipedia:' namespace + percent-decoding
    n = n.withColumn(
        "kb_id",
        _unquote_udf(F.regexp_replace("kb_id", r"^Wikipedia:", "")))
    n = n.withColumn("eid", normalise_link_col(F.col("kb_id")))
    if mapping is not None:
        m = F.broadcast(mapping.select(
            F.col("alias").alias("__alias"),
            F.col("canonical").alias("__canon")))
        n = (n.join(m, n["eid"] == m["__alias"], "left")
             .withColumn("eid", F.coalesce("__canon", "eid"))
             .drop("__alias", "__canon"))

    joined = t.join(n.select("docid", "annot_id", "eid"),
                    ["docid", "annot_id"], "left")
    grouped = joined.groupBy("docid", "start", "end").agg(
        F.first("type").alias("type"),
        F.collect_list(
            F.struct(
                F.col("eid"),
                F.lit(score).alias("score"),
                F.col("type"),
                F.lit(None).cast("map<string,string>").alias("attrs"),
            )
        ).alias("candidates"),
    ).drop("type")
    # un-normalized mentions have NO candidates (reference: bare
    # Annotation), not a null-eid candidate
    grouped = grouped.withColumn(
        "candidates",
        F.filter(F.col("candidates"), lambda c: c["eid"].isNotNull()))
    out = derive_mention_columns(grouped, sort=True)
    return with_is_first(out)
