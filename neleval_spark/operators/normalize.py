"""Row-level normalization of the mentions table.

Implements, as Catalyst expressions (no Python UDFs):

* link normalization — strip wikipedia prefix, spaces→underscores
  (reference: neleval/utils.py:9-23, tested by test.py:175-179);
* redirect mapping — broadcast left join + coalesce
  (reference: neleval/tac.py:83-103 ``read_mapping``/``apply_mapping``);
* candidate sort by descending score, stable on input order
  (reference: neleval/annotation.py:113 ``sorted(..., reverse=True)``);
* top-candidate promotion and derived columns ``is_nil``/``kbid``/
  ``is_linked`` (reference: neleval/annotation.py:85-99, 177-193);
* ``is_first`` — first mention of each eid within a document in
  (start, -end) order (reference: neleval/document.py:64-70).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

WIKI_PREFIX_RE = r"^http://[^.]+\.wikipedia\.org/wiki/"


def normalise_link_col(c: Column) -> Column:
    """Strip wikipedia article prefix; spaces → underscores."""
    return F.replace(F.regexp_replace(c, WIKI_PREFIX_RE, ""),
                     F.lit(" "), F.lit("_"))


def apply_mapping(df: DataFrame, mapping: DataFrame | None,
                  eid_col: str = "eid") -> DataFrame:
    """Normalize ``eid_col`` and rewrite through a redirect mapping.

    ``mapping`` has columns (alias, canonical); it is a small dim table
    → broadcast hash join, the same primitive the construction
    pipeline's alias-dictionary candidate generation uses.
    Mirrors reference semantics: the title itself maps to itself and
    unmapped ids keep their normalized form (neleval/tac.py:83-103).
    """
    out = df.withColumn(eid_col, normalise_link_col(F.col(eid_col)))
    if mapping is None:
        return out
    m = F.broadcast(mapping.select(
        F.col("alias").alias("__alias"), F.col("canonical").alias("__canon")))
    return (
        out.join(m, out[eid_col] == m["__alias"], "left")
        .withColumn(eid_col, F.coalesce(F.col("__canon"), F.col(eid_col)))
        .drop("__alias", "__canon")
    )


def sort_candidates(cands: Column) -> Column:
    """Sort a candidates array by descending score, stable on original
    position (replicates Python's stable ``sorted(reverse=True)`` used
    at neleval/annotation.py:113)."""
    indexed = F.transform(
        cands, lambda c, i: F.struct(c.alias("c"), i.alias("pos")))
    return F.transform(
        F.array_sort(
            indexed,
            lambda a, b: F.when(
                F.coalesce(a["c"]["score"], F.lit(-1e308))
                > F.coalesce(b["c"]["score"], F.lit(-1e308)), F.lit(-1)
            )
            .when(
                F.coalesce(a["c"]["score"], F.lit(-1e308))
                < F.coalesce(b["c"]["score"], F.lit(-1e308)), F.lit(1)
            )
            .when(a["pos"] < b["pos"], F.lit(-1))
            .when(a["pos"] > b["pos"], F.lit(1))
            .otherwise(F.lit(0)),
        ),
        lambda x: x["c"],
    )


def derive_mention_columns(df: DataFrame, sort: bool = True) -> DataFrame:
    """Promote the top candidate and compute derived columns.

    Input needs (docid, start, end, candidates); output matches
    MENTIONS_SCHEMA minus ``is_first`` (see :func:`with_is_first`).
    """
    out = df
    if sort:
        out = out.withColumn("candidates", sort_candidates(F.col("candidates")))
    # F.get (0-based, NULL out-of-bounds): empty candidate lists are
    # legal (bare-span rows).  NOT try_element_at — its codegen declares
    # the isNull temp non-assignably inside fused projections and every
    # task falls back to interpreted mode (observed on 4.1.2).
    top = F.get(F.col("candidates"), F.lit(0))
    # Bare spans (no candidates) get NULL is_nil/is_linked, not booleans:
    # the reference's Annotation.__getattr__ returns None when there is
    # no top candidate (neleval/annotation.py:91-99), so boolean measure
    # filters (e.g. strong_nil_match) silently drop bare-span rows —
    # NULL-in-filter gives the identical drop here.
    has_cand = F.size(F.col("candidates")) > 0
    out = (
        out.withColumn("eid", top["eid"])
        .withColumn("score", top["score"])
        .withColumn("type", top["type"])
        .withColumn("attrs", top["attrs"])
        .withColumn(
            "is_nil",
            F.when(has_cand,
                   F.col("eid").isNull() | F.col("eid").startswith("NIL")),
        )
        .withColumn("is_linked", F.when(has_cand, ~F.col("is_nil")))
        .withColumn(
            "kbid", F.when(F.coalesce(F.col("is_linked"), F.lit(False)),
                           F.col("eid")))
    )
    return out


def with_is_first(df: DataFrame) -> DataFrame:
    """``is_first`` = first mention of this eid in the doc by
    (start, -end) order (reference: neleval/document.py:20-23, 64-70).

    Window partitioned by (docid, eid) — bounded cardinality per
    partition key, no skew concern beyond hub entities which AQE
    handles at aggregation time.
    """
    w = Window.partitionBy("docid", "eid").orderBy(
        F.col("start").asc(), F.col("end").desc())
    return df.withColumn("is_first", F.row_number().over(w) == 1)


def field_col(name: str):
    """Resolve a measure key/filter field to a Column.

    Physical columns resolve directly; anything else falls back to the
    dynamic candidate-attrs map (reference: dynamic JSON attributes,
    neleval/annotation.py:158-175; used as measure keys per
    configs.py:262-265).
    """
    from ..schema import PHYSICAL_FIELDS

    if name in PHYSICAL_FIELDS:
        return F.col(name)
    return F.coalesce(F.col("attrs").getItem(name),
                      F.lit(None).cast("string"))
