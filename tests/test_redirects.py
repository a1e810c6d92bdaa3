"""Redirect-chain resolution (neleval_spark/graph/redirects.py):
chains, cycles, self-loops, hop counts, functional tie-break,
pointer-doubling round count, and partitioning invariance."""

import pytest

from neleval_spark.graph.redirects import resolve_redirect_chains


def _resolve(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, "src string, dst string")
    return {r["src"]: (r["target"], r["hops"], r["resolved"])
            for r in resolve_redirect_chains(df, **kw).collect()}


def test_chain_cycle_selfloop(spark):
    got = _resolve(spark, [
        ("a", "b"), ("b", "c"), ("c", "d"),        # chain → d
        ("x", "y"), ("y", "x"),                    # 2-cycle
        ("s", "s"),                                # self-loop
        ("q", "d"),                                # 1 hop to final
    ])
    assert got == {
        "a": ("d", 3, True),
        "b": ("d", 2, True),
        "c": ("d", 1, True),
        "q": ("d", 1, True),
        "x": (None, None, False),
        "y": (None, None, False),
        "s": (None, None, False),
    }, got


def test_long_chain_exact_hops_and_round_count(spark):
    # 20-hop chain: resolves in ceil(log2) rounds, hops exact
    pairs = [(f"n{i}", f"n{i + 1}") for i in range(20)]
    stats = {}
    df = resolve_redirect_chains(
        spark.createDataFrame(pairs, "src string, dst string"),
        stats=stats)
    got = {r["src"]: (r["target"], r["hops"])
           for r in df.collect()}
    assert got["n0"] == ("n20", 20)
    assert got["n19"] == ("n20", 1)
    assert stats["rounds"] <= 5
    # chain longer than max_hops comes back unresolved
    short = _resolve(spark, pairs, max_hops=16)
    assert short["n0"] == (None, None, False)
    assert short["n10"] == ("n20", 10, True)


def test_functional_tiebreak_and_validation(spark):
    got = _resolve(spark, [("a", "z"), ("a", "b")])  # min dst wins
    assert got["a"] == ("b", 1, True)
    with pytest.raises(ValueError):
        _resolve(spark, [("a", "b")], max_hops=20)


def test_partition_invariance(spark):
    pairs = [(f"n{i}", f"n{(i + 1)}") for i in range(15)] \
        + [("c0", "c1"), ("c1", "c2"), ("c2", "c0")]
    df = spark.createDataFrame(pairs, "src string, dst string")
    base = {r["src"]: (r["target"], r["hops"], r["resolved"])
            for r in resolve_redirect_chains(df).collect()}
    again = {r["src"]: (r["target"], r["hops"], r["resolved"])
             for r in resolve_redirect_chains(
                 df.repartition(13)).collect()}
    assert base == again
    assert base["c0"] == (None, None, False)
