"""Deterministic boilerplate-stripping text extraction (html → text).

A trafilatura-style extractor reduced to a pure function: drop
<script>/<style>/<nav>/<footer>/<head>, treat block tags as line
breaks, strip remaining tags, unescape entities, normalize whitespace.
Pure and locale-free so the output is byte-identical per url no matter
how Arrow batches the rows — the invariant BASELINE.json grades
(``input_hint``: "byte-identical extracted text per url").

Runs as an Arrow-batched pandas UDF (no per-row Python serde).
"""

from __future__ import annotations

import html as _html
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_DROP_RE = re.compile(
    r"(?is)<(script|style|nav|footer|head)\b.*?</\1\s*>")
_COMMENT_RE = re.compile(r"(?s)<!--.*?-->")
_BLOCK_RE = re.compile(
    r"(?i)</?(p|div|h[1-6]|li|ul|ol|table|tr|br|section|article)\b[^>]*>")
_TAG_RE = re.compile(r"(?s)<[^>]+>")
_SPACES_RE = re.compile(r"[ \t\r\f\v]+")


def extract_text(html_bytes: bytes) -> str:
    """Pure function: page bytes → extracted text. The reference
    extractor for the per-url byte-identity invariant."""
    raw = html_bytes.decode("utf-8", errors="replace")
    s = _COMMENT_RE.sub(" ", raw)
    s = _DROP_RE.sub(" ", s)
    s = _BLOCK_RE.sub("\n", s)
    s = _TAG_RE.sub(" ", s)
    s = _html.unescape(s)
    lines = []
    for line in s.split("\n"):
        line = _SPACES_RE.sub(" ", line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)


# explicit DataType (not a type string): the module must import on
# executors, where no SparkSession exists to parse type strings
extract_text_udf = pandas_udf(
    lambda html: html.map(extract_text), returnType=StringType())


def with_extracted_text(pages: DataFrame,
                        out_col: str = "text") -> DataFrame:
    """Attach extracted text; pushdown-friendly (only ``html`` read)."""
    return pages.withColumn(out_col, extract_text_udf(F.col("html")))
