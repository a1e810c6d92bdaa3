"""Type-hierarchy weight expansion (reference: WeightsForHierarchy,
neleval/prepare.py:107-145).

A JSON {parent: [children]} hierarchy becomes a (gold_type, sys_type,
weight) table where a pair at distance d gets decay**d. Tiny
driver-side recursion → a broadcastable dim table, exactly how the
reference consumes it (TypeWeighting, configs.py:276-289)."""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession


def weights_for_hierarchy(spark: SparkSession, hierarchy,
                          decay: float = 0.5) -> DataFrame:
    if not 0 <= decay <= 1.0:
        raise ValueError("Decay must be greater than 0 and at most 1")
    if isinstance(hierarchy, str):
        hierarchy = json.loads(hierarchy)

    out: list[tuple[str, str, float]] = []

    def descend(gold, children, weight):
        for child in children:
            out.append((gold, child, weight))
            descend(gold, hierarchy.get(child, ()), weight * decay)

    for parent, children in hierarchy.items():
        descend(parent, children, decay)

    return spark.createDataFrame(
        out, "gold_type string, sys_type string, weight double")


def load_type_weights(spark: SparkSession, path: str) -> DataFrame:
    """Read a 3-column TSV weight table, keeping the max weight per
    (gold, sys) pair (reference: TypeWeighting, configs.py:276-289)."""
    from pyspark.sql import functions as F

    # quote/escape disabled: the reference splits lines on tabs
    # verbatim (no CSV quoting layer), and the annotation readers do
    # the same — default CSV dequoting would desync the join keys for
    # values containing quotes or backslashes
    raw = spark.read.csv(path, sep="\t", quote="", escape="",
                         schema="gold_type string, sys_type string, "
                                "weight double")
    return raw.na.fill("", ["gold_type", "sys_type"]) \
        .groupBy("gold_type", "sys_type").agg(
            F.max("weight").alias("weight"))
