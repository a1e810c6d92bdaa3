"""k-core peel (graph/kcore.py): semantics vs networkx-free
hand-checked graphs + a pure-Python replica, peel-depth iteration
counts, idempotence, and core numbers."""
import pytest
from pyspark.sql import functions as F


def _py_kcore(edges, k):
    """Reference peel on a python edge set."""
    e = {tuple(sorted(t)) for t in edges if t[0] != t[1]}
    while True:
        deg = {}
        for a, b in e:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        bad = {v for v, d in deg.items() if d < k}
        if not bad:
            return e
        e2 = {t for t in e if t[0] not in bad and t[1] not in bad}
        if e2 == e:
            return e
        e = e2


def _df(spark, edges):
    return spark.createDataFrame(list(edges) or [("x", "x")],
                                 "src string, dst string")


def test_kcore_ring_with_pendants(spark):
    from neleval_spark.graph.kcore import kcore

    ring = [(f"R{i}", f"R{(i + 1) % 6}") for i in range(6)]
    # pendant chains of length 2: peel cascades two rounds
    pend = [("R0", "P0"), ("P0", "Q0"), ("R3", "P3")]
    stats = {}
    out = kcore(_df(spark, ring + pend), 2, stats=stats)
    got = {(r["a"], r["b"]) for r in out.collect()}
    assert got == {tuple(sorted(t)) for t in ring}
    # Q0/P3 leaves peel round 1, P0 becomes a leaf and peels round 2,
    # round 3 confirms the fixpoint
    assert stats["iterations"] == 3


def test_kcore_star_empties_and_self_loops(spark):
    from neleval_spark.graph.kcore import kcore

    star = [("hub", f"s{i}") for i in range(10)] + [("hub", "hub")]
    assert kcore(_df(spark, star), 2).count() == 0
    # 1-core of a simple graph is the graph itself (minus self-loops)
    assert kcore(_df(spark, star), 1).count() == 10


def test_kcore_matches_python_replica(spark):
    from neleval_spark.graph.kcore import kcore

    # deterministic pseudo-random graph with mixed shells
    edges = [(f"v{(i * 7) % 23}", f"v{(i * i + 3) % 23}")
             for i in range(60)]
    for k in (1, 2, 3, 4):
        got = {(r["a"], r["b"])
               for r in kcore(_df(spark, edges), k).collect()}
        assert got == _py_kcore(edges, k), k


def test_kcore_idempotent_and_guards(spark):
    from neleval_spark.graph.kcore import kcore

    edges = [(f"v{i}", f"v{(i + 1) % 5}") for i in range(5)]
    once = kcore(_df(spark, edges), 2)
    twice = kcore(once, 2, src_col="a", dst_col="b")
    assert ({tuple(r) for r in once.collect()}
            == {tuple(r) for r in twice.collect()})
    with pytest.raises(ValueError, match="k must be"):
        kcore(_df(spark, edges), 0)
    # a long path needs peel depth ~len/2: max_iterations guards
    path = [(f"p{i}", f"p{i + 1}") for i in range(12)]
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore(_df(spark, path), 2, max_iterations=3)


def test_core_numbers(spark):
    from neleval_spark.graph.kcore import core_numbers

    # triangle (core 2) + tail (core 1)
    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "t1"),
             ("t1", "t2")]
    got = {r["v"]: r["core"]
           for r in core_numbers(_df(spark, edges)).collect()}
    assert got == {"a": 2, "b": 2, "c": 2, "t1": 1, "t2": 1}
