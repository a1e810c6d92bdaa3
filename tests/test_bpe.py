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
