"""Span validation: classify duplicate / nested / crossing span pairs
per document (reference: Document._validate, neleval/document.py:34-62,
with the pair classification of Annotation.compare_spans,
annotation.py:64-78).

Spark form: a within-document self-join on the overlap predicate (the
reference's sweep-line finds the same pairs); classification is a CASE
expression. Returns the offending pairs so callers can warn or raise
('ignore'/'warn'/'error' policy, document.py:28-32).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def classify_span_pairs(mentions: DataFrame) -> DataFrame:
    """All overlapping intra-document span pairs with their class:
    'duplicate' | 'nested' | 'crossing'."""
    base = mentions.select("docid", "start", "end").withColumn(
        "_rid", F.monotonically_increasing_id())
    a = base.select(
        F.col("docid"), F.col("start").alias("a_start"),
        F.col("end").alias("a_end"), F.col("_rid").alias("a_id"))
    b = base.select(
        F.col("docid"), F.col("start").alias("b_start"),
        F.col("end").alias("b_end"), F.col("_rid").alias("b_id"))
    pairs = a.join(b, "docid").where(
        (F.col("a_id") < F.col("b_id"))
        & (F.col("a_start") <= F.col("b_end"))
        & (F.col("b_start") <= F.col("a_end"))
    )
    # neleval/annotation.py:69-78
    cls = (
        F.when(
            (F.col("a_start") == F.col("b_start"))
            & (F.col("a_end") == F.col("b_end")), F.lit("duplicate"))
        .when(
            (F.col("a_start") < F.col("b_start"))
            & (F.col("a_end") >= F.col("b_end")), F.lit("nested"))
        .when(
            (F.col("a_start") >= F.col("b_start"))
            & (F.col("a_end") < F.col("b_end")), F.lit("nested"))
        .otherwise(F.lit("crossing"))
    )
    return pairs.select(
        "docid", "a_start", "a_end", "b_start", "b_end",
        cls.alias("issue"))


def validate_spans(
    mentions: DataFrame,
    duplicate: str = "error",
    crossing: str = "warn",
    nested: str = "ignore",
) -> DataFrame:
    """Apply the warn/error policy per issue class (reference CLI:
    ValidateSpans, document.py:141-168). Returns the issue pairs for
    non-ignored classes; raises on the first 'error'-class issue."""
    import warnings

    policy = {"duplicate": duplicate, "crossing": crossing,
              "nested": nested}
    active = [k for k, v in policy.items() if v != "ignore"]
    if not active:
        return classify_span_pairs(mentions).limit(0)
    issues = classify_span_pairs(mentions).where(
        F.col("issue").isin(active))
    issues = issues.cache()
    counts = {r["issue"]: r["count"]
              for r in issues.groupBy("issue").count().collect()}
    for issue, n in counts.items():
        if policy[issue] == "error":
            example = issues.where(F.col("issue") == issue).first()
            raise ValueError(
                f"Found annotations with {issue} span: {example}")
        warnings.warn(f"Found {n} annotation pair(s) with {issue} span")
    return issues


def to_weak(mentions: DataFrame) -> DataFrame:
    """Char-level explode for weak evaluation (reference: ToWeak,
    neleval/weak.py:17-21): one mention per character position,
    span (i, i+1) as in the reference's half-open emission."""
    return mentions.withColumn(
        "start", F.explode(F.sequence("start", "end"))
    ).withColumn("end", F.col("start") + 1)
