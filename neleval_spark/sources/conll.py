"""CoNLL coreference reader and prepare stage (reference:
read_conll_coref, neleval/coref_metrics.py:190-229; PrepareConllCoref,
neleval/import_.py:37-110).

The format is inherently sequential per document (stateful parenthesis
matching over token lines), so documents are split on
``#begin/#end document`` markers and each document is parsed inside an
``applyInPandas`` group — documents are small; the corpus scales out.

Scale note (doc-boundary assignment): a naive global
``Window.orderBy(line_no)`` would funnel the whole corpus through one
partition.  Instead doc indices are a two-pass partition prefix-sum
(the classic zipWithIndex shape): each scan partition counts its
``#begin document`` markers in parallel, the per-partition totals (one
row per partition — KBs, not data-proportional) are cumulated on the
driver, and every line's global doc index is
``partition_offset + running_count_within_partition``.  Both passes
read the same deterministic file splits, so partition ids agree.
"""

from __future__ import annotations

import re
from collections import defaultdict

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_TAG_RE = re.compile(r"\(?[^()|]+\)?")

BEGIN = "#begin document "
END = "#end document"


def parse_conll_coref_lines(lines) -> dict:
    """Pure per-document parser: token lines → {cid: {(start, end)}}
    (token positions are 1-based, spans inclusive — reference
    :203-224, keeping only the outermost of identical spans)."""
    res: dict = defaultdict(set)
    i = 0
    opened: dict = defaultdict(list)
    for line in lines:
        if line.startswith("#"):
            continue
        parts = line.split()
        if not parts:
            assert not opened
            continue
        i += 1
        tag = parts[-1]
        closed_here = []
        for match in _TAG_RE.finditer(tag):
            m = match.group()
            cid = m.strip("()")
            if m.startswith("("):
                opened[cid].append(i)
            if m.endswith(")"):
                start = opened[cid].pop()
                if not opened[cid]:
                    del opened[cid]
                closed_here.append((cid, start))
        # identical spans: keep only one mention (the outermost)
        import itertools
        import operator

        for _, mentions in itertools.groupby(closed_here,
                                             operator.itemgetter(1)):
            cid, start = list(mentions)[-1]
            res[cid].add((start, i))
    assert not opened
    return dict(res)


def _lines_with_doc_idx(spark: SparkSession, path: str) -> DataFrame:
    """File lines annotated with a global ``doc_idx`` via the two-pass
    partition prefix-sum described in the module docstring."""
    raw = spark.read.text(path).select(
        F.input_file_name().alias("file"),
        F.spark_partition_id().alias("pid"),
        F.monotonically_increasing_id().alias("line_no"),
        "value",
    )
    # trailing space included: a bare '#begin document' line is a
    # comment in the reference (import_.py:42 startswith BEGIN)
    is_begin = F.col("value").startswith(BEGIN).cast("long")

    # pass 1: markers per scan partition (tiny result, parallel scan)
    totals = {
        r["pid"]: r["n"]
        for r in raw.groupBy("pid").agg(F.sum(is_begin).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid] or 0
    offset_col = F.element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
        F.col("pid"),
    ) if offsets else F.lit(0)

    # pass 2: running count within each partition (parallel windows)
    w = Window.partitionBy("pid").orderBy("line_no").rowsBetween(
        Window.unboundedPreceding, 0)
    return raw.withColumn(
        "doc_idx", (F.sum(is_begin).over(w) + offset_col).cast("long"))


def _doc_names(lines: DataFrame) -> DataFrame:
    """One row per document: (doc_idx, docid) with the reference's
    naming (import_.py:43-49): docid = '_'.join(rest-of-marker.split())
    or ``doc<N>`` (N = 0-based document position in the file) when the
    marker carries no name."""
    markers = lines.where(F.col("value").startswith(BEGIN))
    name = F.concat_ws(
        "_",
        F.split(
            F.trim(F.substring(F.trim(F.col("value")),
                               len(BEGIN) + 1, 1 << 30)),
            r"\s+",
        ),
    )
    w = Window.partitionBy("file").orderBy("doc_idx")
    return markers.select(
        "doc_idx",
        name.alias("__name"),
        (F.row_number().over(w) - 1).alias("__doc_no"),
    ).select(
        "doc_idx",
        F.when(F.col("__name") == "",
               F.concat(F.lit("doc"), F.col("__doc_no").cast("string")))
        .otherwise(F.col("__name")).alias("docid"),
    )


def read_conll_coref(spark: SparkSession, path: str) -> DataFrame:
    """→ (docid, cid, start, end) cluster-membership rows."""
    lines = _lines_with_doc_idx(spark, path)

    def parse(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("line_no")
        clusters = parse_conll_coref_lines(pdf["value"].tolist())
        out = [
            {"doc_idx": int(pdf["doc_idx"].iloc[0]),
             "cid": str(cid), "start": s, "end": e}
            for cid, spans in clusters.items()
            for s, e in spans
        ]
        return pd.DataFrame(
            out, columns=["doc_idx", "cid", "start", "end"])

    parsed = lines.groupBy("doc_idx").applyInPandas(
        parse, schema="doc_idx long, cid string, start long, end long")
    names = _doc_names(lines)
    # doc_idx is kept: output ordering parity with the reference's
    # stable sorted(annotations) needs the input-document ordinal as
    # the tie-break on equal (start, -end), not docid lexical order
    return parsed.join(names, "doc_idx").select(
        "docid", "cid", "start", "end", "doc_idx")


def prepare_conll_coref(
    spark: SparkSession,
    path: str,
    with_kb: bool = False,
    cross_doc: bool = False,
) -> DataFrame:
    """CoNLL'11-12 coref → normalized mentions DataFrame (reference:
    PrepareConllCoref + _coref_to_annotations, import_.py:10-34):

    * ``with_kb=False`` (default): every cluster label is NIL-prefixed;
    * labels starting with ``NIL`` get a ``:docid`` suffix unless
      ``cross_doc`` (per-document NIL label spaces);
    * each mention becomes an annotation with the single candidate
      ``Candidate(cid)`` (no score, no type).
    """
    from ..operators.normalize import derive_mention_columns, with_is_first

    rows = read_conll_coref(spark, path)
    cid = F.col("cid")
    if not with_kb:
        cid = F.concat(F.lit("NIL"), cid)
    cid = F.when(
        cid.startswith("NIL"),
        cid if cross_doc else F.concat(cid, F.lit(":"), F.col("docid")),
    ).otherwise(cid)
    out = rows.select(
        "docid", "start", "end", "doc_idx",
        F.array(
            F.struct(
                cid.alias("eid"),
                F.lit(None).cast("double").alias("score"),
                F.lit(None).cast("string").alias("type"),
                F.lit(None).cast("map<string,string>").alias("attrs"),
            )
        ).alias("candidates"),
    )
    out = derive_mention_columns(out, sort=False)
    return with_is_first(out)
