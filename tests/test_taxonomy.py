"""Taxonomy closure + type inheritance: hand-computed DAGs (diamond,
deep chain), cycle safety, the schema-size guard, and seeded random
graphs vs a pure-Python BFS closure."""

import random

import pytest
from pyspark.sql import functions as F

from neleval_spark.graph import infer_types, taxonomy_closure


def _closure_oracle(edges, max_depth=10 ** 9):
    """Min-depth reachability by BFS from every node (pure Python)."""
    adj = {}
    for c, p in edges:
        adj.setdefault(c, set()).add(p)
    out = {}
    for start in set(adj) | {p for _, p in edges}:
        frontier, depth, seen = {start}, 0, {}
        while frontier and depth < max_depth:
            depth += 1
            frontier = {p for n in frontier for p in adj.get(n, ())}
            for p in frontier:
                if p not in seen:
                    seen[p] = depth
            frontier = {p for p in frontier if seen[p] == depth}
        for anc, d in seen.items():
            out[(start, anc)] = d
    return out


def _closure_spark(spark, edges, **kw):
    df = spark.createDataFrame(edges, "child string, parent string")
    rows = taxonomy_closure(df, **kw).collect()
    got = {(r["node"], r["ancestor"]): r["depth"] for r in rows}
    assert len(got) == len(rows), "duplicate (node, ancestor) pair"
    return got


def test_diamond_min_depth(spark):
    # d -> b -> a, d -> c -> a, plus shortcut d -> a: min depth wins
    edges = [("d", "b"), ("d", "c"), ("b", "a"), ("c", "a"),
             ("d", "a")]
    got = _closure_spark(spark, edges)
    assert got == _closure_oracle(edges)
    assert got[("d", "a")] == 1


def test_deep_chain_converges_early(spark):
    # 20-deep chain with max_depth=32 -> ceil(log2 31)=5 round cap;
    # convergence must hit at round 5 exactly (2^5 >= 20)
    edges = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(20)]
    stats = {}
    df = spark.createDataFrame(edges, "child string, parent string")
    rows = taxonomy_closure(df, stats=stats).collect()
    got = {(r["node"], r["ancestor"]): r["depth"] for r in rows}
    assert got == _closure_oracle(edges)
    assert got[("n00", "n20")] == 20
    assert stats["rounds"] <= 5 + 1  # +1 fixpoint-confirmation round


def test_cycle_terminates(spark):
    edges = [("a", "b"), ("b", "a"), ("b", "c")]
    got = _closure_spark(spark, edges)
    assert got == _closure_oracle(edges)
    assert got[("a", "a")] == 2 and got[("a", "c")] == 2


def test_max_nodes_guard(spark):
    df = spark.createDataFrame(
        [(f"c{i}", "root") for i in range(50)],
        "child string, parent string")
    with pytest.raises(ValueError, match="max_nodes"):
        taxonomy_closure(df, max_nodes=10)


def test_infer_types_diamond_and_single_type_paths(spark):
    edges = [("cat", "mammal"), ("mammal", "animal"),
             ("cat", "pet"), ("pet", "animal")]
    closure = taxonomy_closure(
        spark.createDataFrame(edges, "child string, parent string"))
    inst = spark.createDataFrame(
        [("felix", "cat"), ("rex", "mammal")],
        "entity string, type string")
    got = {(r["entity"], r["type"]): r["depth"]
           for r in infer_types(inst, closure).collect()}
    assert got[("felix", "cat")] == 0
    assert got[("felix", "animal")] == 2  # min over the two paths
    assert got[("rex", "animal")] == 1
    # single-typed instances: the shuffle-free path agrees exactly
    nodedup = {(r["entity"], r["type"]): r["depth"]
               for r in infer_types(inst, closure,
                                    dedup=False).collect()}
    assert nodedup == got


def test_random_dags_vs_python_oracle(spark):
    rng = random.Random(4257)
    for _ in range(4):
        n = rng.randint(8, 26)
        # forward edges only -> DAG; ~2 parents per node
        edges = sorted({
            (f"v{i:02d}", f"v{j:02d}")
            for i in range(n) for j in range(i + 1, n)
            if rng.random() < 2.0 / max(1, n - i - 1)})
        if not edges:
            continue
        assert _closure_spark(spark, edges) == _closure_oracle(edges)


def test_cyclic_random_graphs_vs_python_oracle(spark):
    rng = random.Random(977)
    for _ in range(3):
        n = rng.randint(5, 12)
        edges = sorted({
            (f"v{i}", f"v{rng.randrange(n)}")
            for i in range(n) for _ in range(2)})
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        assert _closure_spark(spark, edges) == _closure_oracle(edges)
