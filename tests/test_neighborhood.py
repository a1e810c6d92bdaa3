"""k-hop neighborhood queries (graph/neighborhood.py)."""

from pyspark.sql import functions as F

from neleval_spark.graph.neighborhood import (
    cooccurrence_edges, k_hop_neighbors)


def _triples(spark, pairs):
    return spark.createDataFrame(
        [(a, "cooccurs_with", b) for a, b in pairs],
        "subj string, pred string, obj string")


def test_min_hop_chain(spark):
    # a - b - c - d: from a, c is 2 hops, d is out of the 2-ball
    t = _triples(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    seeds = spark.createDataFrame([("a",)], "seed string")
    got = {(r["entity"], r["hops"])
           for r in k_hop_neighbors(t, seeds, max_hops=2).collect()}
    assert got == {("a", 0), ("b", 1), ("c", 2)}


def test_min_hop_prefers_shorter_path(spark):
    # a-b, a-c, b-c: c reachable at hop 1 AND via b at hop 2 -> 1
    t = _triples(spark, [("a", "b"), ("a", "c"), ("b", "c")])
    seeds = spark.createDataFrame([("a",)], "seed string")
    got = {(r["entity"], r["hops"])
           for r in k_hop_neighbors(t, seeds, max_hops=2).collect()}
    assert got == {("a", 0), ("b", 1), ("c", 1)}


def test_symmetry_and_pair_dedup(spark):
    # edge stored once as (x, y); BFS from y must still reach x;
    # repeated witness urls (duplicate triple rows) don't multiply
    t = _triples(spark, [("x", "y"), ("x", "y"), ("x", "y")])
    seeds = spark.createDataFrame([("y",)], "seed string")
    rows = k_hop_neighbors(t, seeds, max_hops=2).collect()
    assert {(r["entity"], r["hops"]) for r in rows} == \
        {("y", 0), ("x", 1)}
    assert len(rows) == 2  # no duplicate (seed, entity) rows
    assert cooccurrence_edges(t).count() == 2  # one edge each way


def test_hub_guard_prunes_expansion_through_hub(spark):
    # hub h connects to 10 spokes; seed s - h - spokes.
    # with max_degree=5 the hub's expansion is pruned: spokes
    # unreachable, but the hub itself still appears at hop 1.
    pairs = [("s", "h")] + [("h", f"n{i}") for i in range(10)]
    t = _triples(spark, pairs)
    seeds = spark.createDataFrame([("s",)], "seed string")
    full = k_hop_neighbors(t, seeds, max_hops=2).collect()
    assert len(full) == 12  # s, h, 10 spokes
    guarded = k_hop_neighbors(t, seeds, max_hops=2,
                              max_degree=5).collect()
    assert {(r["entity"], r["hops"]) for r in guarded} == \
        {("s", 0), ("h", 1)}


def test_multi_seed_independence(spark):
    t = _triples(spark, [("a", "b"), ("c", "d")])
    seeds = spark.createDataFrame([("a",), ("c",)], "seed string")
    out = k_hop_neighbors(t, seeds, max_hops=2)
    per_seed = {r["seed"]: set() for r in out.collect()}
    for r in out.collect():
        per_seed[r["seed"]].add(r["entity"])
    assert per_seed == {"a": {"a", "b"}, "c": {"c", "d"}}
