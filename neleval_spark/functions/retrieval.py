"""Lexical retrieval over document tables: BM25 top-k scoring.

No reference counterpart (neleval is retrieval-free); BM25 follows
the published Okapi/Lucene formulation (Robertson & Zaragoza 2009 —
public knowledge, independent implementation).  The corpus-quality
use case: score every crawled document against a fixed query (seed
keywords, a topic filter, a contamination probe) and keep the top-k.

Spark-first design — the textbook implementation builds an inverted
index (explode tokens → groupBy term → join back), which at web
scale shuffles one row PER TOKEN OCCURRENCE.  For a fixed, small
query this is all waste: only the query's own terms matter.  Here:

* term frequencies are IN-ROW column expressions — one
  ``size(filter(tokens, t == term))`` per query term over the same
  split-once token array (no explode, no shuffle, stays inside
  whole-stage codegen);
* corpus statistics (N, avgdl, per-term document frequencies) are
  ONE 1-row aggregate with map-side partials, broadcast back via a
  1×1 cross join (the same in-plan-scalar pattern as pagerank's
  dangling mass — no driver collect);
* the result is a ``TakeOrderedAndProject`` top-k, never a global
  sort.

Cost at 100 TB: two narrow scans of (id, text) — one for the stats
row, one for scoring — zero data-proportional exchanges.  Tokens
follow the corpus-wide convention (``textops.tokens``: lowercase,
split on ``[^a-z0-9]+``), so the DuckDB oracle reproduces scores
exactly (both engines round to 6 dp before the final ordering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by BM25 score for ``query_terms``.

    Returns (doc id, score) rows, score rounded to 6 dp,
    deterministic order (score desc, id).  Documents matching no
    query term are dropped.  idf uses the Lucene-style
    ``ln(1 + (N - df + 0.5)/(df + 0.5))`` (never negative).
    """
    terms = list(dict.fromkeys(query_terms))  # dedupe, keep order
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
        lambda t: t != "",
    )
    tf_cols = [
        F.size(F.filter(F.col("_toks"), lambda t: t == F.lit(term)))
        .cast("double").alias(f"tf_{i}")
        for i, term in enumerate(terms)
    ]
    base = docs.select(F.col(id_col).alias("id"),
                       toks.alias("_toks")) \
        .select("id", F.size("_toks").cast("double").alias("dl"),
                *tf_cols)

    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("dl").alias("avgdl"),
        *[F.sum((F.col(f"tf_{i}") > 0).cast("int")).cast("double")
          .alias(f"df_{i}") for i in range(len(terms))],
    )

    parts = []
    for i in range(len(terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}") + F.lit(0.5)))
        norm = (F.col(f"tf_{i}")
                + F.lit(k1) * (F.lit(1.0 - b)
                               + F.lit(b) * F.col("dl") / F.col("avgdl")))
        parts.append(
            F.when(F.col(f"tf_{i}") > 0,
                   idf * F.col(f"tf_{i}") * F.lit(k1 + 1.0) / norm)
            .otherwise(F.lit(0.0)))
    score = parts[0]
    for p in parts[1:]:
        score = score + p

    return (
        base.crossJoin(F.broadcast(stats))
        .select("id", F.round(score, 6).alias("score"))
        .where(F.col("score") > 0)
        .orderBy(F.col("score").desc(), "id")
        .limit(k)
    )
