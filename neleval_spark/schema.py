"""Canonical schemas for the engine.

The ``mentions`` schema is the normalized annotation data model
(reference: neleval/annotation.py:22-235 — Annotation/Candidate row
objects, flattened here with the top candidate promoted to columns and
the full candidate list retained).  Offsets follow the reference
convention: ``end`` is INCLUSIVE (reference doc/formats.rst:21-24).
``eid`` beginning with ``NIL`` marks a cluster id, otherwise a KB id
(reference: neleval/annotation.py:184-189).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

ATTRS_TYPE = MapType(StringType(), StringType())

CANDIDATE_TYPE = StructType(
    [
        StructField("eid", StringType()),
        StructField("score", DoubleType()),
        StructField("type", StringType()),
        StructField("attrs", ATTRS_TYPE),
    ]
)

# Normalized mention row; candidates sorted by descending score
# (reference: neleval/annotation.py:113) with the top candidate's
# fields promoted (reference delegation: neleval/annotation.py:91-99).
MENTIONS_SCHEMA = StructType(
    [
        StructField("docid", StringType(), False),
        StructField("start", LongType(), False),
        StructField("end", LongType(), False),
        StructField("eid", StringType()),
        StructField("score", DoubleType()),
        StructField("type", StringType()),
        StructField("attrs", ATTRS_TYPE),
        StructField("candidates", ArrayType(CANDIDATE_TYPE)),
        StructField("is_nil", BooleanType()),
        StructField("is_linked", BooleanType()),
        StructField("kbid", StringType()),
        StructField("is_first", BooleanType()),
    ]
)

# Pipeline input corpus (BASELINE.json input_hint): Common-Crawl-style
# web pages.
WEB_PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)

# Emitted knowledge-graph triples.
TRIPLES_SCHEMA = StructType(
    [
        StructField("subj", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj", StringType(), False),
        StructField("url", StringType()),
        StructField("part_id", LongType()),
    ]
)

# Physical (non-derived) mention fields; anything else requested as a
# measure key resolves through the dynamic ``attrs`` map (reference:
# neleval/annotation.py:158-175, configs.py:262-265).
PHYSICAL_FIELDS = {
    "docid",
    "start",
    "end",
    "eid",
    "score",
    "type",
    "kbid",
    "is_nil",
    "is_linked",
    "is_first",
}
