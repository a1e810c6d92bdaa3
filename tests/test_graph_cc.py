"""Connected-components utility: chains (the O(log n) stress case for
star contraction), random graphs vs a local union-find oracle, and the
Hungarian assignment kernel vs brute force."""

import itertools
import random

import numpy as np
import pytest

from neleval_spark.functions.assignment import max_weight_assignment_total
from neleval_spark.functions.unionfind import UnionFind
from neleval_spark.graph import connected_components


def _cc_oracle(edges):
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    comps = {}
    for v in uf.parent:
        comps.setdefault(uf.find(v), set()).add(v)
    return {frozenset(s) for s in comps.values()}


def _cc_spark(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    # driver_max_edges=0 forces the distributed star-contraction path
    rows = connected_components(df, driver_max_edges=0).collect()
    comps = {}
    for r in rows:
        comps.setdefault(r["component"], set()).add(r["vertex"])
    # component label must be the min vertex id of its members
    for label, members in comps.items():
        assert label == min(members)
    return {frozenset(s) for s in comps.values()}


def test_cc_chain(spark):
    """A 400-node path: naive min-propagation needs O(n) rounds; the
    star-contraction implementation must converge well inside the
    iteration cap."""
    edges = [(f"v{i:04d}", f"v{i + 1:04d}") for i in range(399)
             if i != 199]
    assert _cc_spark(spark, edges) == _cc_oracle(edges)


def test_cc_random(spark):
    rng = random.Random(7)
    n = 300
    edges = [
        (f"n{rng.randrange(n):03d}", f"n{rng.randrange(n):03d}")
        for _ in range(250)
    ]
    edges = [e for e in edges if e[0] != e[1]]
    assert _cc_spark(spark, edges) == _cc_oracle(edges)


def test_cc_star_and_selfloops(spark):
    edges = [("hub", f"leaf{i}") for i in range(50)] + [("hub", "hub")]
    comps = _cc_spark(spark, edges)
    assert comps == {frozenset({"hub"} | {f"leaf{i}" for i in range(50)})}


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_assignment_vs_bruteforce(seed):
    rng = np.random.default_rng(seed)
    for _ in range(40):
        n = int(rng.integers(1, 6))
        m = int(rng.integers(1, 6))
        W = np.round(rng.random((n, m)) * 10, 3)
        k = min(n, m)
        best = max(
            (
                sum(W[r, c] for r, c in zip(rsub, csub))
                for rsub in itertools.permutations(range(n), k)
                for csub in itertools.permutations(range(m), k)
            ),
            default=0.0,
        )
        assert abs(max_weight_assignment_total(W) - best) < 1e-9
