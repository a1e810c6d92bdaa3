
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


def test_subsample_frequent_semantics(spark):
    """Mikolov subsampling: rare words always survive, the dominant
    token thins to ~sqrt(t/f), empty docs pass through,
    deterministic across partitionings."""
    from neleval_spark.functions.textops import subsample_frequent

    rows = [(i, f"the alpha{i} the beta{i} the") for i in range(100)]
    rows.append((1000, ""))
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = subsample_frequent(d, t_num=1, t_den=100).collect()
    by = {r["doc_id"]: r for r in out}
    the_kept = sum(r["subsampled_text"].split().count("the")
                   for r in out)
    rare_kept = sum(1 for r in out
                    for t in r["subsampled_text"].split()
                    if t != "the")
    # rare words: c*t_den = 100 <= t_num*T = 500 -> always kept
    assert rare_kept == 200
    # 'the': c=300, T=500 -> p_keep = sqrt(5/300) ~ 0.129
    assert 10 <= the_kept <= 80, the_kept
    assert by[1000]["n_tokens"] == 0
    assert by[1000]["subsampled_text"] == ""
    out2 = subsample_frequent(d.repartition(7), t_num=1,
                              t_den=100).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_fim_transform_semantics(spark):
    from neleval_spark.functions.textops import fim_transform

    texts = ["def add(a, b):\n    return a + b", "", "x",
             "the quick brown fox jumps over the lazy dog"]
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(100 * texts)],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in fim_transform(d).collect()}
    originals = {i: t for i, t in enumerate(100 * texts)}
    applied = [r for r in out.values() if r["fim_applied"]]
    passed = [r for r in out.values() if not r["fim_applied"]]
    # the 500k ppm coin selects roughly half; both branches present
    assert 100 < len(applied) < 300
    for r in passed:  # pass-through rows keep text; -1 sentinels
        assert r["fim_text"] == originals[r["doc_id"]]
        assert r["split_start"] == -1 and r["split_end"] == -1
    for r in applied:  # lossless reassembly from PSM order
        t = r["fim_text"]
        assert t.startswith("<PRE>")
        pre, rest = t[5:].split("<SUF>", 1)
        suf, mid = rest.split("<MID>", 1)
        assert pre + mid + suf == originals[r["doc_id"]]
        assert 0 <= r["split_start"] <= r["split_end"] \
            <= len(originals[r["doc_id"]])
        assert pre == originals[r["doc_id"]][:r["split_start"]]
    # deterministic across recomputation
    again = {r["doc_id"]: r["fim_text"]
             for r in fim_transform(d).collect()}
    assert again == {k: v["fim_text"] for k, v in out.items()}
    # rate 0 / full-rate bounds
    assert fim_transform(d, rate_ppm=0) \
        .where("fim_applied").count() == 0
    assert fim_transform(d, rate_ppm=1_000_000) \
        .where("NOT fim_applied").count() == 0
    import pytest
    with pytest.raises(ValueError, match="rate_ppm"):
        fim_transform(d, rate_ppm=2_000_000)
    # scale shape: no shuffle anywhere in the plan
    plan = (fim_transform(d)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
