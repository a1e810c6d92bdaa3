"""CoNLL coreference reader (reference: read_conll_coref,
neleval/coref_metrics.py:190-229; PrepareConllCoref,
neleval/import_.py:37-71).

The format is inherently sequential per document (stateful parenthesis
matching over token lines), so documents are split on
``#begin/#end document`` markers and each document is parsed inside an
``applyInPandas`` group — documents are small; the corpus scales out.
"""

from __future__ import annotations

import re
from collections import defaultdict

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TAG_RE = re.compile(r"\(?[^()|]+\)?")


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


def read_conll_coref(spark: SparkSession, path: str) -> DataFrame:
    """→ (docid, cid, start, end) cluster-membership rows."""
    raw = spark.read.text(path).select(
        F.monotonically_increasing_id().alias("line_no"), "value")

    # assign doc ids by counting '#begin document' markers up to each
    # line (a running window over the file order)
    from pyspark.sql import Window

    w = Window.orderBy("line_no").rowsBetween(
        Window.unboundedPreceding, 0)
    marked = raw.withColumn(
        "doc_idx",
        F.sum(F.when(F.col("value").startswith("#begin document"), 1)
              .otherwise(0)).over(w))

    def parse(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("line_no")
        lines = pdf["value"].tolist()
        name = None
        for ln in lines:
            if ln.startswith("#begin document"):
                name = ln[len("#begin document"):].strip(" ();")
                break
        clusters = parse_conll_coref_lines(lines)
        out = [
            {"docid": name or str(pdf["doc_idx"].iloc[0]),
             "cid": str(cid), "start": s, "end": e}
            for cid, spans in clusters.items()
            for s, e in spans
        ]
        return pd.DataFrame(out,
                            columns=["docid", "cid", "start", "end"])

    return marked.groupBy("doc_idx").applyInPandas(
        parse, schema="docid string, cid string, start long, end long")
