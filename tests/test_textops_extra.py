
def test_skipgram_pairs_window_semantics(spark):
    from neleval_spark.functions.textops import skipgram_pairs

    d = spark.createDataFrame([(1, "a b c"), (2, ""), (3, "x")],
                              "doc_id long, text string")
    w1 = sorted((r["center"], r["context"], r["n"])
                for r in skipgram_pairs(d, window=1).collect())
    assert w1 == [("a", "b", 1), ("b", "a", 1),
                  ("b", "c", 1), ("c", "b", 1)]
    w2 = {(r["center"], r["context"]): r["n"]
          for r in skipgram_pairs(d, window=2).collect()}
    assert w2[("a", "c")] == 1 and w2[("c", "a")] == 1
    # a single-token doc contributes nothing; repeats accumulate
    d2 = spark.createDataFrame([(1, "a b a b")],
                               "doc_id long, text string")
    n = {(r["center"], r["context"]): r["n"]
         for r in skipgram_pairs(d2, window=1).collect()}
    assert n[("a", "b")] == 3 and n[("b", "a")] == 3


def test_skipgram_pairs_single_exchange(spark):
    from neleval_spark.functions.textops import skipgram_pairs

    d = spark.createDataFrame([(1, "a b c d e")],
                              "doc_id long, text string")
    plan = (skipgram_pairs(d)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1
