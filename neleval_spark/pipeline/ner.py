"""Batched NER mention detection.

Deterministic capitalized-run detector over extracted text, run as
``mapInPandas`` (Arrow batch in, mention rows out — SURVEY.md §2.10).
Offsets follow the reference convention: ``end`` is INCLUSIVE
(reference doc/formats.rst:21-24). Each mention carries its line
("sentence") index and the line text as linking context for the
scoring stage.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

MENTION_RE = re.compile(r"[A-Z][A-Za-z&'-]*(?: [A-Z][A-Za-z&'-]*)*")

NER_SCHEMA = ("url string, start long, end long, surface string, "
              "sent_uid int, context string")


def detect_mentions_text(text: str):
    """Pure per-document detector: yields
    (start, end_inclusive, surface, line_idx, line_text). The title
    line is line 0; sentence lines are numbered from 0 to match the
    corpus generator's sent_uid."""
    offset = 0
    for li, line in enumerate(text.split("\n")):
        for m in MENTION_RE.finditer(line):
            yield (offset + m.start(), offset + m.end() - 1, m.group(),
                   li - 1, line)
        offset += len(line) + 1


def detect_mentions(pages: DataFrame) -> DataFrame:
    """url+text → mention rows."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for url, text in zip(pdf["url"], pdf["text"]):
                for s, e, surf, li, line in detect_mentions_text(text):
                    out.append((url, s, e, surf, li, line))
            yield pd.DataFrame(
                out, columns=["url", "start", "end", "surface",
                              "sent_uid", "context"])

    return pages.select("url", "text").mapInPandas(gen, schema=NER_SCHEMA)


def extract_and_detect(pages: DataFrame) -> DataFrame:
    """url+html → mention rows, extraction and NER fused into ONE
    Python hop.

    Chaining two Python operators inside one Spark stage (extract UDF
    feeding mapInPandas) costs ~5× in per-batch JVM↔Python round trips;
    fusing them keeps a single Arrow boundary and no extra shuffle —
    the per-document text never crosses back into the JVM.
    """
    from .extract import extract_text

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for url, html in zip(pdf["url"], pdf["html"]):
                text = extract_text(html)
                for s, e, surf, li, line in detect_mentions_text(text):
                    out.append((url, s, e, surf, li, line))
            yield pd.DataFrame(
                out, columns=["url", "start", "end", "surface",
                              "sent_uid", "context"])

    return pages.select("url", "html").mapInPandas(gen, schema=NER_SCHEMA)
