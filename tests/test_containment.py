"""Asymmetric shingle containment (textops.ngram_containment_pairs)."""

from neleval_spark.functions.textops import (
    ngram_containment_pairs, ngram_jaccard_pairs)


def test_quote_detection(spark):
    full = ("alpha beta gamma delta epsilon zeta eta theta iota "
            "kappa lambda mu nu xi omicron pi rho sigma tau")
    quote = "delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(1, full), (2, quote), (3, "unrelated words entirely here")],
        "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(2, 1), (3, 1)], "doc_a long, doc_b long")
    out = {(r["doc_a"], r["doc_b"]): r
           for r in ngram_containment_pairs(docs, pairs, n=3).collect()}
    q = out[(2, 1)]
    assert q["contain_a_in_b"] == 1.0          # every quote shingle in full
    assert q["contain_b_in_a"] < 0.2           # full not inside quote
    assert q["jaccard"] < 0.2                  # jaccard misses the quote
    u = out[(3, 1)]
    assert u["contain_a_in_b"] == 0.0 and u["jaccard"] == 0.0


def test_short_doc_empty_shingles(spark):
    docs = spark.createDataFrame(
        [(1, "one two"), (2, "one two three four")],
        "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    r = ngram_containment_pairs(docs, pairs, n=3).collect()[0]
    # doc 1 has <n tokens: empty shingle set -> NULL containment
    assert r["contain_a_in_b"] is None
    assert r["contain_b_in_a"] == 0.0
    # jaccard denominator = sz_b only
    assert r["jaccard"] == 0.0


def test_jaccard_unchanged_by_refactor(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "c d e f g")],
        "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    r = ngram_jaccard_pairs(docs, pairs, n=3).collect()[0]
    # shingles: {abc,bcd,cde} vs {cde,def,efg}; i=1, union=5
    assert r["jaccard"] == 0.2
