"""Inverted index + phrase matching (functions/retrieval.py)."""

import pytest

from neleval_spark.functions.retrieval import (
    build_inverted_index, phrase_match, term_stats)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown cat; the quick brown fox!"),
    (3, "Quick--Brown, quick brown quick"),
    (4, ""),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_postings_tf_and_positions(spark):
    idx = build_inverted_index(_docs(spark))
    got = {(r.term, r.doc_id): (r.tf, list(r.positions))
           for r in idx.collect()}
    assert got[("the", 1)] == (2, [0, 6])
    assert got[("quick", 3)] == (3, [0, 2, 4])  # punctuation split
    assert got[("fox", 2)] == (1, [7])
    assert ("", 4) not in got and not any(
        d == 4 for (_, d) in got)  # empty doc yields nothing


def test_non_positional(spark):
    idx = build_inverted_index(_docs(spark), positional=False)
    assert "positions" not in idx.columns
    got = {(r.term, r.doc_id): r.tf for r in idx.collect()}
    assert got[("brown", 3)] == 2 and got[("quick", 3)] == 3


def test_term_stats(spark):
    st = {r.term: (r.df, r.cf)
          for r in term_stats(
              build_inverted_index(_docs(spark))).collect()}
    assert st["quick"] == (3, 6)
    assert st["dog"] == (1, 1)


def test_phrase_match(spark):
    idx = build_inverted_index(_docs(spark))
    got = {r.doc_id: r.n_matches
           for r in phrase_match(idx, ["quick", "brown"]).collect()}
    assert got == {1: 1, 2: 2, 3: 2}
    # trigram phrase crosses the punctuation boundary in doc 3
    got3 = {r.doc_id: r.n_matches
            for r in phrase_match(
                idx, ["quick", "brown", "fox"]).collect()}
    assert got3 == {1: 1, 2: 1}
    # case-insensitive query convention
    assert phrase_match(idx, ["QUICK", "Brown"]).count() == 3
    # absent phrase
    assert phrase_match(idx, ["lazy", "fox"]).count() == 0
    with pytest.raises(ValueError):
        phrase_match(idx, [])


def test_index_plan_shape(spark):
    """PLANS.md claim: one inherent Generate (posexplode) + hash
    aggregation; no Window, no join."""
    plan = build_inverted_index(_docs(spark))._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Generate") == 1
    assert "Window" not in plan and "Join" not in plan


def test_keyword_topk(spark):
    from neleval_spark.functions.retrieval import (
        build_inverted_index, keyword_topk)

    idx = build_inverted_index(_docs(spark), positional=False)
    out = keyword_topk(idx, k=2)
    got = {}
    for r in out.collect():
        got.setdefault(r.doc_id, []).append((r.rank, r.term, r.tfidf))
    import math

    for d, kws in got.items():
        assert [k[0] for k in sorted(kws)] == \
            list(range(1, len(kws) + 1))
        vals = [k[2] for k in sorted(kws)]
        assert all(v >= 0 for v in vals)  # df == N scores exactly 0
        assert vals == sorted(vals, reverse=True)
    # doc-unique terms win rank 1 (df=1 → max idf)
    assert sorted(got[2])[0][1] == "cat"
    # exact value check: cat in doc 2 = 1 * ln((3+1)/(1+1))
    assert sorted(got[2])[0][2] == round(math.log(2.0), 6)
    # 'quick' has df == N → tfidf 0, never beats a positive term
    assert sorted(got[3])[0][1] == "brown"
