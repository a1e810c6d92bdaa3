"""Cross-generation KG maintenance (pipeline/triples.py:
aggregate_kg / merge_kg / prune_kg)."""

import pytest

from neleval_spark.pipeline.triples import (
    aggregate_kg, merge_kg, prune_kg)


def _wit(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, url string")


def test_aggregate_counts_distinct_urls(spark):
    t = _wit(spark, [
        ("a", "p", "b", "u1"), ("a", "p", "b", "u2"),
        ("a", "p", "b", "u1"),  # repeat witness
        ("a", "p", "c", "u1"),
    ])
    got = {(r.subj, r.obj): (r.n_pages, r.first_seen, r.last_seen)
           for r in aggregate_kg(t, generation=3).collect()}
    assert got == {("a", "b"): (2, 3, 3), ("a", "c"): (1, 3, 3)}


@pytest.fixture()
def gens(spark):
    g1 = aggregate_kg(_wit(spark, [
        ("a", "p", "b", "u1"), ("a", "p", "b", "u2"),
        ("stale", "p", "x", "u3"),
    ]), generation=1)
    g2 = aggregate_kg(_wit(spark, [
        ("a", "p", "b", "u9"),          # re-observed, fewer pages
        ("new", "p", "y", "u4"), ("new", "p", "y", "u5"),
    ]), generation=2)
    return g1, g2


def test_merge_replace(spark, gens):
    g1, g2 = gens
    got = {(r.subj, r.obj): (r.n_pages, r.first_seen, r.last_seen)
           for r in merge_kg(g1, g2, mode="replace").collect()}
    assert got == {
        ("a", "b"): (1, 1, 2),      # delta count supersedes
        ("stale", "x"): (1, 1, 1),  # base-only persists
        ("new", "y"): (2, 2, 2),    # delta-only inserted
    }


def test_merge_sum(spark, gens):
    g1, g2 = gens
    got = {(r.subj, r.obj): r.n_pages
           for r in merge_kg(g1, g2, mode="sum").collect()}
    assert got == {("a", "b"): 3, ("stale", "x"): 1, ("new", "y"): 2}


def test_merge_is_iterable(spark, gens):
    # fold a third generation over the merge of the first two
    g1, g2 = gens
    g3 = aggregate_kg(_wit(spark, [("a", "p", "b", "u1")]),
                      generation=3)
    kg = merge_kg(merge_kg(g1, g2), g3)
    got = {(r.subj, r.obj): (r.n_pages, r.first_seen, r.last_seen)
           for r in kg.collect()}
    assert got[("a", "b")] == (1, 1, 3)
    assert got[("stale", "x")] == (1, 1, 1)


def test_prune_staleness(spark, gens):
    g1, g2 = gens
    kg = merge_kg(g1, g2)
    kept = {r.subj for r in
            prune_kg(kg, current_gen=2, max_staleness=0).collect()}
    assert kept == {"a", "new"}  # stale (last_seen=1) evicted
    all_kept = {r.subj for r in
                prune_kg(kg, current_gen=2, max_staleness=1).collect()}
    assert all_kept == {"a", "new", "stale"}


def test_bad_mode_raises(spark, gens):
    with pytest.raises(ValueError, match="mode"):
        merge_kg(*gens, mode="max")


def test_merge_plan_single_join(spark, gens):
    """PLANS.md claim: ONE full-outer equi-join on the triple key."""
    g1, g2 = gens
    plan = merge_kg(g1, g2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("FullOuter") == 1
    assert "Window" not in plan and "CartesianProduct" not in plan
