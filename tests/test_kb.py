"""KB profile materialization (pipeline/kb.py)."""

import pytest

from neleval_spark.pipeline.kb import build_kb_profiles


def _mentions(spark):
    # E1: surface counts a=3, b=3 (tie -> lexicographically smallest
    # canonical "a"), c=1; types PER=4, ORG=3 -> PER.
    # E2: single surface/type; 2 urls.
    rows = [
        ("u1", "a", "E1", "PER"),
        ("u1", "a", "E1", "PER"),
        ("u2", "a", "E1", "ORG"),
        ("u2", "b", "E1", "PER"),
        ("u3", "b", "E1", "ORG"),
        ("u3", "b", "E1", "ORG"),
        ("u3", "c", "E1", "PER"),
        ("u1", "zz", "E2", "LOC"),
        ("u4", "zz", "E2", "LOC"),
        ("u5", None, None, None),  # NIL-less row must be dropped
    ]
    return spark.createDataFrame(
        rows, "url string, surface string, eid string, "
              "entity_type string")


def test_profiles_basic(spark):
    prof = {r["eid"]: r for r in
            build_kb_profiles(_mentions(spark), reuse=False).collect()}
    assert set(prof) == {"E1", "E2"}
    e1 = prof["E1"]
    assert e1["canonical_name"] == "a"          # tie 3-3, 'a' < 'b'
    assert e1["aliases"] == "a|b|c"
    assert e1["n_aliases"] == 3
    assert e1["entity_type"] == "PER"           # 4 PER vs 3 ORG
    assert e1["n_mentions"] == 7
    assert e1["n_docs"] == 3
    e2 = prof["E2"]
    assert e2["canonical_name"] == "zz"
    assert e2["aliases"] == "zz"
    assert e2["n_mentions"] == 2 and e2["n_docs"] == 2


def test_top_k_and_salt_merge(spark):
    # 40 distinct surfaces for one entity with strictly decreasing
    # counts: the salted two-level top-k must agree with the naive
    # global ranking regardless of which salt bucket each lands in.
    rows = []
    for i in range(40):
        for _ in range(40 - i):
            rows.append((f"u{i}", f"s{i:02d}", "E", "PER"))
    m = spark.createDataFrame(
        rows, "url string, surface string, eid string, "
              "entity_type string")
    out = build_kb_profiles(m, max_aliases=5, salt_buckets=8,
                            reuse=False).collect()
    assert len(out) == 1
    assert out[0]["aliases"] == "s00|s01|s02|s03|s04"
    assert out[0]["canonical_name"] == "s00"
    assert out[0]["n_aliases"] == 40


def test_triples_enrichment(spark):
    triples = spark.createDataFrame(
        [("E1", "cooccurs_with", "E2"),
         ("E1", "cooccurs_with", "E3"),
         ("E2", "cooccurs_with", "E3"),
         ("E1", "mentioned_in", "u1"),
         ("E1", "mentioned_in", "u2"),
         ("E2", "mentioned_in", "u1")],
        "subj string, pred string, obj string")
    m = spark.createDataFrame(
        [("u1", "x", "E1", "PER"), ("u1", "y", "E2", "ORG"),
         ("u9", "w", "E9", "LOC")],
        "url string, surface string, eid string, entity_type string")
    prof = {r["eid"]: r for r in
            build_kb_profiles(m, triples=triples,
                              reuse=False).collect()}
    assert prof["E1"]["degree"] == 2 and prof["E1"]["n_pages"] == 2
    assert prof["E2"]["degree"] == 2 and prof["E2"]["n_pages"] == 1
    # entity absent from the triple table -> zeros, not nulls
    assert prof["E9"]["degree"] == 0 and prof["E9"]["n_pages"] == 0


def test_reuse_handle_and_cache_hygiene(spark):
    out = build_kb_profiles(_mentions(spark), reuse=True)
    assert len(out._materialized_deps) == 1
    out.collect()
    for dep in out._materialized_deps:
        dep.unpersist()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_no_mention_scale_collect_or_window(spark):
    # plan pin: exactly one exchange keyed on the raw mention table
    # (the (eid, surface, entity_type) aggregate); no Window operator
    plan = build_kb_profiles(_mentions(spark), reuse=False) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
