"""BPE tokenizer training (functions/bpe.py) vs a pure-Python
reference implementation of Sennrich et al. 2016."""
import pyspark.sql.functions as F


def _py_bpe(word_counts, n_merges, min_count=2):
    """Reference BPE: dict-of-tuples, greedy left-to-right merge,
    ties on (count DESC, left ASC, right ASC)."""
    words = {tuple(list(w) + ["</w>"]): n
             for w, n in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pc = {}
        for syms, n in words.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + n
        if not pc:
            break
        pair, n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_count:
            break
        merges.append(pair)
        new = {}
        for syms, cnt in words.items():
            out = []
            for s in syms:
                if out and out[-1] == pair[0] and s == pair[1]:
                    out[-1] = pair[0] + pair[1]
                else:
                    out.append(s)
            key = tuple(out)
            new[key] = new.get(key, 0) + cnt
        words = new
    return merges, words


def test_bpe_matches_reference_implementation(spark):
    from neleval_spark.functions.bpe import bpe_train

    corpus = ("low " * 5 + "lower " * 2 + "newest " * 6
              + "widest " * 3 + "newer " * 2)
    docs = spark.createDataFrame([(1, corpus)],
                                 "doc_id long, text string")
    got_merges, got_words = bpe_train(docs, n_merges=12)
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "newer": 2}
    exp_merges, exp_words = _py_bpe(wc, 12)
    assert got_merges == exp_merges
    got_final = {r["word"]: tuple(r["syms"])
                 for r in got_words.collect()}
    # reference keys are symbol tuples; re-derive per original word
    exp_final = {}
    for w, n in wc.items():
        syms = list(w) + ["</w>"]
        for a, b in exp_merges:
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            syms = out
        exp_final[w] = tuple(syms)
    assert got_final == exp_final


def test_bpe_greedy_overlap_and_min_count(spark):
    """aaa under merge (a,a) must become [aa, a] (non-overlapping
    greedy), and training must stop before sub-min_count merges."""
    from neleval_spark.functions.bpe import bpe_train

    docs = spark.createDataFrame([(1, "aaa aaa unique")],
                                 "doc_id long, text string")
    merges, words = bpe_train(docs, n_merges=50, min_count=2)
    final = {r["word"]: r["syms"] for r in words.collect()}
    assert merges[0] == ("a", "a")
    # 'unique' appears once: none of its internal pairs (count 1)
    # may ever be merged
    assert all(len(m[0] + m[1].replace("</w>", "")) <= 6
               for m in merges)
    assert final["aaa"] in (["aaa</w>"], ["aa", "a", "</w>"],
                            ["aaa", "</w>"], ["aa", "a</w>"])
    # the pure-Python reference agrees on the whole trace
    exp_merges, _ = _py_bpe({"aaa": 2, "unique": 1}, 50)
    assert merges == exp_merges


def test_bpe_leaves_no_cache_entries(spark):
    from neleval_spark.functions.bpe import bpe_train

    docs = spark.createDataFrame([(1, "ab ab cd")],
                                 "doc_id long, text string")
    bpe_train(docs, n_merges=3)
    assert spark._jsparkSession.sharedState().cacheManager() \
        .isEmpty()


def _seq_apply(word, merges):
    """Sequential in-training-order application (apply_merge's fold
    semantics) — the equivalence target for encode_word."""
    syms = list(word) + ["</w>"]
    for a, b in merges:
        out = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        syms = out
    return syms


def test_encode_word_equals_sequential_replay_fuzzed():
    """min-rank iterative encode == sequential rule replay, on every
    word over a tiny alphabet against merges trained on a skewed
    corpus (the classic subword-nmt equivalence)."""
    import itertools

    from neleval_spark.functions.bpe import encode_word

    wc = {"abab": 9, "abc": 7, "bca": 5, "aab": 4, "cc": 3, "babb": 2}
    merges, _ = _py_bpe(wc, 10, min_count=1)
    ranks = {p: i for i, p in enumerate(merges)}
    for n in range(1, 6):
        for tup in itertools.product("abc", repeat=n):
            w = "".join(tup)
            assert encode_word(w, ranks) == _seq_apply(w, merges), w


def test_bpe_encode_reproduces_training_table(spark):
    """Encoding the training corpus must reproduce bpe_train's own
    final word-symbol table, word for word."""
    from neleval_spark.functions.bpe import bpe_encode, bpe_train

    corpus = ("low " * 5 + "lower " * 2 + "newest " * 6
              + "widest " * 3 + "newer " * 2)
    docs = spark.createDataFrame([(1, corpus)],
                                 "doc_id long, text string")
    merges, words = bpe_train(docs, n_merges=12)
    final = {r["word"]: list(r["syms"]) for r in words.collect()}

    one_per_word = spark.createDataFrame(
        [(i, w) for i, w in enumerate(sorted(final))],
        "doc_id long, text string")
    enc = {r["doc_id"]: list(r["pieces"])
           for r in bpe_encode(one_per_word, merges).collect()}
    for i, w in enumerate(sorted(final)):
        assert enc[i] == final[w], w


def test_bpe_encode_document_order_and_empty_docs(spark):
    from neleval_spark.functions.bpe import bpe_encode

    docs = spark.createDataFrame(
        [(1, "ab ba ab"), (2, ""), (3, "xyz")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           bpe_encode(docs, [("a", "b"), ("ab", "</w>")]).collect()}
    assert out[1]["pieces"] == ["ab</w>", "b", "a", "</w>", "ab</w>"]
    assert out[1]["n_pieces"] == 5
    assert (out[2]["n_pieces"], list(out[2]["pieces"])) == (0, [])
    assert out[3]["pieces"] == ["x", "y", "z", "</w>"]
