"""BM25 top-k (neleval_spark/functions/retrieval.py) against an
independent pure-Python implementation of the Lucene-style formula,
plus the plan-shape contract (no explode, no data-proportional
shuffle — the in-row-tf design)."""

import math
import re

import pytest

from neleval_spark.functions.retrieval import bm25_topk

DOCS = [
    (0, "spark shuffles the hash table across the cluster"),
    (1, "the window sort runs inside one partition"),
    (2, "spark spark spark window window hash"),
    (3, "a tiny doc"),
    (4, "hash join versus merge join: the hash side broadcasts"),
    (5, "window functions order rows; spark plans the window once"),
]


def _py_bm25(docs, terms, k1=1.2, b=0.75):
    tok = [re.findall(r"[a-z0-9]+", t.lower()) for _, t in docs]
    n = len(docs)
    avgdl = sum(len(t) for t in tok) / n
    df = {q: sum(1 for t in tok if q in t) for q in terms}
    out = {}
    for (did, _), t in zip(docs, tok):
        s = 0.0
        for q in terms:
            tf = t.count(q)
            if not tf:
                continue
            idf = math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(t) / avgdl))
        if s > 0:
            out[did] = round(s, 6)
    return out


def test_bm25_matches_pure_python(spark):
    terms = ["spark", "window", "hash"]
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["id"]: r["score"]
           for r in bm25_topk(df, terms, k=10).collect()}
    want = _py_bm25(DOCS, terms)
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=2e-6), d
    # doc 2 stuffs the query terms but is short: must rank first
    top = bm25_topk(df, terms, k=1).collect()[0]
    assert top["id"] == 2


def test_bm25_dedupes_terms_and_plan_shape(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = bm25_topk(df, ["spark", "spark"], k=10).collect()
    c = bm25_topk(df, ["spark"], k=10).collect()
    assert [(r["id"], r["score"]) for r in a] == \
        [(r["id"], r["score"]) for r in c]

    out = bm25_topk(df, ["spark", "window"], k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    # in-row tf: no explode, no token shuffle; the only exchange is
    # the 1-row stats aggregate; top-k is TakeOrderedAndProject
    assert "Generate" not in plan            # no explode
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Exchange hashpartitioning") == 0
