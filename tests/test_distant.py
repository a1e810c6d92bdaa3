"""Distant-supervision family: hand-built sentence/KB cases for pair
generation, multi-label KB matching, deterministic NA sampling and
pattern induction, plus a seeded random-corpus differential against a
pure-Python replica of the whole family."""

import random

import pytest
from pyspark.sql import functions as F

from neleval_spark.pipeline.distant import (
    NA_LABEL, cooccurring_pairs, distant_label, induce_patterns)

MOD = 2 ** 31 - 1


def _phash(s):
    h = 0
    for c in s:
        h = (h * 31 + ord(c)) % MOD
    return h


def _na_hash(url, sent_id, subj, obj, denom=1_000_000, salt="#na"):
    return _phash("#".join([url, str(sent_id), subj, obj, salt])) % denom


MENTIONS_SCHEMA = ("url string, sent_id long, start long, end long, "
                   "eid string")


def _mentions(spark, rows):
    return spark.createDataFrame(rows, MENTIONS_SCHEMA)


def test_pairs_closest_cooccurrence_kept(spark):
    # E1 mentioned twice; the (E1, E2) pair must use the closer E1
    rows = [("u1", 0, 0, 3, "E1"), ("u1", 0, 20, 23, "E1"),
            ("u1", 0, 30, 33, "E2")]
    got = {(r["subj_eid"], r["obj_eid"]): r
           for r in cooccurring_pairs(_mentions(spark, rows)).collect()}
    assert set(got) == {("E1", "E2"), ("E2", "E1")}
    assert got[("E1", "E2")]["subj_start"] == 20
    assert got[("E1", "E2")]["gap"] == 30 - 23
    assert got[("E2", "E1")]["obj_start"] == 20


def test_pairs_heavy_sentence_excluded_and_counted(spark):
    rows = [("u1", 0, 10 * i, 10 * i + 3, f"E{i}") for i in range(5)]
    rows += [("u2", 0, 0, 3, "E1"), ("u2", 0, 10, 13, "E2")]
    stats = {}
    got = cooccurring_pairs(_mentions(spark, rows), max_mentions=4,
                            stats=stats).collect()
    assert stats["dropped_sentences"] == 1
    assert {r["url"] for r in got} == {"u2"}
    assert len(got) == 2  # both directions


def test_distant_label_multilabel_and_na(spark):
    rows = [("u1", 0, 0, 4, "E1"), ("u1", 0, 10, 14, "E2"),
            ("u1", 1, 0, 4, "E3"), ("u1", 1, 10, 14, "E4")]
    kb = spark.createDataFrame(
        [("E1", "born_in", "E2"), ("E1", "lives_in", "E2"),
         ("E1", "born_in", "E2")],  # duplicate must not double rows
        "subj string, pred string, obj string")
    pairs = cooccurring_pairs(_mentions(spark, rows))
    out = distant_label(pairs, kb, na_keep_ppm=1_000_000).collect()
    by_pair = {}
    for r in out:
        by_pair.setdefault((r["subj_eid"], r["obj_eid"]),
                           set()).add(r["pred"])
    assert by_pair[("E1", "E2")] == {"born_in", "lives_in"}
    assert by_pair[("E2", "E1")] == {NA_LABEL}
    assert by_pair[("E3", "E4")] == {NA_LABEL}
    hashes = {(r["subj_eid"], r["obj_eid"]): r["sample_hash"]
              for r in out if r["pred"] == NA_LABEL}
    assert hashes[("E2", "E1")] == _na_hash("u1", 0, "E2", "E1")
    pos_hash = {r["sample_hash"] for r in out if r["pred"] != NA_LABEL}
    assert pos_hash == {-1}  # pinned sentinel, never NULL


def test_distant_label_na_threshold(spark):
    rows = [("u1", 0, 0, 4, "E1"), ("u1", 0, 10, 14, "E2")]
    kb = spark.createDataFrame([("Ex", "p", "Ey")],
                               "subj string, pred string, obj string")
    pairs = cooccurring_pairs(_mentions(spark, rows))
    h12 = _na_hash("u1", 0, "E1", "E2")
    kept = distant_label(pairs, kb, na_keep_ppm=h12 + 1).collect()
    assert ("E1", "E2") in {(r["subj_eid"], r["obj_eid"]) for r in kept}
    dropped = distant_label(pairs, kb, na_keep_ppm=0).collect()
    assert dropped == []


def test_induce_patterns_middle_and_normalization(spark):
    #         0123456789012345678901234567890
    text1 = "Ada was born in   1815 in London"
    # subj "Ada" spans [0,2]; obj "London" spans [26,31]
    rows = [("u1", 0, 0, 2, "E1"), ("u1", 0, 26, 31, "E2"),
            ("u2", 0, 0, 2, "E3"), ("u2", 0, 26, 31, "E4")]
    sents = spark.createDataFrame(
        [("u1", 0, text1), ("u2", 0, "Bob was born in   1900 in Berlin")],
        "url string, sent_id long, text string")
    kb = spark.createDataFrame(
        [("E1", "born_in", "E2"), ("E3", "born_in", "E4")],
        "subj string, pred string, obj string")
    labeled = distant_label(
        cooccurring_pairs(_mentions(spark, rows)), kb, na_keep_ppm=0)
    got = induce_patterns(labeled, sents, min_support=2).collect()
    [r] = got
    assert r["pattern"] == "was born in 0 in"
    assert r["pred"] == "born_in"
    assert r["support"] == 2 and r["pattern_total"] == 2


def test_induce_patterns_min_support_and_gap(spark):
    rows = [("u1", 0, 0, 2, "E1"), ("u1", 0, 200, 205, "E2")]
    sents = spark.createDataFrame(
        [("u1", 0, "x" * 300)], "url string, sent_id long, text string")
    kb = spark.createDataFrame([("E1", "p", "E2")],
                               "subj string, pred string, obj string")
    labeled = distant_label(
        cooccurring_pairs(_mentions(spark, rows)), kb, na_keep_ppm=0)
    # gap 197 > max_gap 80 -> no pattern rows
    assert induce_patterns(labeled, sents, min_support=1).collect() == []
    assert induce_patterns(labeled, sents, min_support=1,
                           max_gap=500).count() == 1


def _python_family(rows, kb, na_keep_ppm, max_mentions=64):
    """Pure-Python replica: pairs -> labels -> NA sampling."""
    by_sent = {}
    for url, sid, s, e, eid in rows:
        by_sent.setdefault((url, sid), []).append((s, e, eid))
    out = []
    for (url, sid), ms in sorted(by_sent.items()):
        if len(ms) > max_mentions:
            continue
        best = {}
        for (s1, e1, a) in ms:
            for (s2, e2, b) in ms:
                if a == b or s1 == s2:
                    continue
                gap = s2 - e1 if e1 < s2 else s1 - e2
                key = (a, b)
                cand = (gap, s1, s2, e1, e2)
                if key not in best or cand < best[key]:
                    best[key] = cand
        for (a, b), (gap, s1, s2, e1, e2) in best.items():
            preds = sorted({p for (ks, p, ko) in kb
                            if ks == a and ko == b})
            if preds:
                for p in preds:
                    out.append((url, sid, a, b, p, -1))
            else:
                h = _na_hash(url, sid, a, b)
                if h < na_keep_ppm:
                    out.append((url, sid, a, b, NA_LABEL, h))
    return sorted(out)


def test_random_corpora_vs_python_oracle(spark):
    rng = random.Random(6121)
    for trial in range(3):
        rows = []
        for u in range(6):
            for sid in range(rng.randint(1, 3)):
                n = rng.randint(0, 6)
                starts = sorted(rng.sample(range(0, 400, 10), n))
                for s in starts:
                    rows.append((f"u{u}", sid, s, s + rng.randint(2, 8),
                                 f"E{rng.randint(0, 9)}"))
        kb = sorted({(f"E{rng.randint(0, 9)}", f"p{rng.randint(0, 2)}",
                      f"E{rng.randint(0, 9)}") for _ in range(12)})
        ppm = rng.choice([0, 300_000, 1_000_000])
        labeled = distant_label(
            cooccurring_pairs(_mentions(spark, rows)),
            spark.createDataFrame(
                kb, "subj string, pred string, obj string"),
            na_keep_ppm=ppm)
        got = sorted(
            (r["url"], r["sent_id"], r["subj_eid"], r["obj_eid"],
             r["pred"], r["sample_hash"])
            for r in labeled.collect())
        assert got == _python_family(rows, kb, ppm), (
            f"trial {trial} ppm {ppm}")
