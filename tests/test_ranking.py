"""ranking_eval (filtered MRR / Hits@k, Bordes et al. 2013 §4)
against a pure-Python brute-force replica: the counting formulation
(rank = 1 + raw_better - known_better) must equal the sort-based
definition (position of the true object in the filtered, totally
ordered candidate list) on every triple."""
import pytest
from pyspark.sql import functions as F

P = 2147483647
US = "\x1f"


def _phash(s: str) -> int:
    acc = 0
    for ch in s:
        acc = (acc * 31 + ord(ch)) % P
    return acc


def _brute_ranks(test, known, entities, salt="#rank"):
    """Sort-based filtered ranking: candidates = all entities minus
    other known-true objects for (s, p); order by (score DESC,
    entity ASC); rank = 1-based position of the true object."""
    out = {}
    for (s, p, o) in test:
        true_objs = {ko for (ks, kp, ko) in known
                     if ks == s and kp == p}
        cands = [e for e in entities
                 if e == o or e not in true_objs]
        cands.sort(key=lambda e: (-_phash(US.join([s, p, e, salt])),
                                  e))
        out[(s, p, o)] = cands.index(o) + 1
    return out


@pytest.fixture(scope="module")
def kg(spark):
    known = [(f"E{i % 5}", pred, obj)
             for i in range(20)
             for pred, obj in [("likes", f"E{(i * 3) % 7}"),
                               ("type", f"T{i % 3}")]]
    known = sorted(set(known))
    # ONE test triple per (subj, pred): with known == test, nothing
    # but the triple itself is filtered — a true RAW baseline for
    # test_filtered_never_worse_than_raw (each subject has ~4 known
    # 'likes' objects, so the filtered setting has room to improve)
    seen, test = set(), []
    for t in known:
        if t[1] == "likes" and (t[0], t[1]) not in seen:
            seen.add((t[0], t[1]))
            test.append(t)
    kdf = spark.createDataFrame(known, "subj string, pred string, "
                                "obj string")
    tdf = spark.createDataFrame(test, "subj string, pred string, "
                                "obj string")
    return known, test, kdf, tdf


def test_ranking_matches_bruteforce(spark, kg):
    from neleval_spark.graph.ranking import ranking_eval

    known, test, kdf, tdf = kg
    entities = sorted({e for (s, _, o) in known for e in (s, o)})
    got = {(r["subj"], r["pred"], r["obj"]): r["rank"]
           for r in ranking_eval(tdf, kdf).collect()}
    want = _brute_ranks(test, known, entities)
    assert got == want
    # reciprocal column consistent with rank
    for r in ranking_eval(tdf, kdf).collect():
        assert abs(r["rr"] - round(1.0 / r["rank"], 6)) < 1e-12


def test_filtered_never_worse_than_raw(spark, kg):
    """Removing known positives from the candidate list can only
    IMPROVE (lower) the rank — the protocol's defining property."""
    from neleval_spark.graph.ranking import ranking_eval

    known, test, kdf, tdf = kg
    filtered = {(r["subj"], r["pred"], r["obj"]): r["rank"]
                for r in ranking_eval(tdf, kdf).collect()}
    # raw setting == filtering against the test triple only
    raw = {(r["subj"], r["pred"], r["obj"]): r["rank"]
           for r in ranking_eval(tdf, tdf,
                                 entities=kdf.select(
                                     F.col("subj").alias("entity"))
                                 .unionByName(kdf.select(
                                     F.col("obj").alias("entity")))
                                 .distinct()).collect()}
    assert all(filtered[k] <= raw[k] for k in filtered)
    assert any(filtered[k] < raw[k] for k in filtered)


def test_ranking_summary_and_injected_scorer(spark, kg):
    from neleval_spark.graph.ranking import (ranking_eval,
                                             ranking_summary)

    known, test, kdf, tdf = kg
    # a scorer that always ranks the true object first: score is 1
    # exactly when the candidate IS the row's true object
    def oracle_scorer(s, p, e):
        return (e == F.col("obj")).cast("long")

    perfect = ranking_eval(tdf, kdf, score_fn=oracle_scorer)
    row = ranking_summary(perfect).collect()[0]
    assert row["n"] == len(test)
    assert row["mrr"] == 1.0 and row["hits_1"] == 1.0
    # hash scorer: summary fields agree with per-row ranks
    ranked = ranking_eval(tdf, kdf)
    rows = ranked.collect()
    row = ranking_summary(ranked, ks=(1, 3)).collect()[0]
    n = len(rows)
    assert row["n"] == n
    assert row["hits_3"] == round(
        sum(r["rank"] <= 3 for r in rows) / n, 6)
    assert abs(row["mrr"]
               - sum(r["rr"] for r in rows) / n) < 1e-6
