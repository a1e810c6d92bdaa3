"""HITS hubs/authorities (neleval_spark/graph/hits.py): values
against an independent numpy power iteration with the same L1
normalization and per-iteration rounding, structural sanity on a
bipartite hub/authority graph, early stop, and partitioning
invariance."""

import numpy as np

from neleval_spark.graph.hits import hits


def _numpy_hits(edges, iters=10, scale=9):
    edges = sorted(set(edges))
    verts = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    hub = np.round(np.full(n, 1.0 / n), scale)
    auth = np.round(np.full(n, 1.0 / n), scale)
    for _ in range(iters):
        a = np.zeros(n)
        for s, d in edges:
            a[idx[d]] += hub[idx[s]]
        auth = np.round(a / a.sum(), scale) if a.sum() > 0 else a
        h = np.zeros(n)
        for s, d in edges:
            h[idx[s]] += auth[idx[d]]
        hub = np.round(h / h.sum(), scale) if h.sum() > 0 else h
    return ({v: hub[idx[v]] for v in verts},
            {v: auth[idx[v]] for v in verts})


EDGES = [
    ("h1", "a1"), ("h1", "a2"), ("h1", "a3"),
    ("h2", "a1"), ("h2", "a2"),
    ("h3", "a3"),
    ("a1", "h3"),          # back-edge: a1 is also a (weak) hub
    ("h1", "a1"),          # parallel edge, must count once
]


def test_hits_matches_numpy(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r["vertex"]: (r["hub"], r["auth"])
           for r in hits(df, iters=6).collect()}
    nh, na = _numpy_hits(EDGES, iters=6)
    assert set(got) == set(nh)
    for v in nh:
        assert abs(got[v][0] - nh[v]) < 1e-9, (v, got[v], nh[v])
        assert abs(got[v][1] - na[v]) < 1e-9, (v, got[v], na[v])


def test_hits_structure_and_sums(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    rows = hits(df, iters=6).collect()
    hub = {r["vertex"]: r["hub"] for r in rows}
    auth = {r["vertex"]: r["auth"] for r in rows}
    assert abs(sum(hub.values()) - 1.0) < 1e-6
    assert abs(sum(auth.values()) - 1.0) < 1e-6
    # h1 links all three authorities — the best hub; a1 is cited by
    # the two best hubs — the best authority
    assert hub["h1"] == max(hub.values())
    assert auth["a1"] == max(auth.values())
    # pure authorities never act as hubs (a2 has no out-edges)
    assert hub["a2"] == 0.0 and auth["h1"] == 0.0


def test_hits_partition_invariance_and_early_stop(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    base = {r["vertex"]: (r["hub"], r["auth"])
            for r in hits(df, iters=6).collect()}
    again = {r["vertex"]: (r["hub"], r["auth"])
             for r in hits(df.repartition(17), iters=6).collect()}
    assert again == base
    # a 2-cycle alternates nothing after one round: early stop fires
    # and the output still equals the full run
    cyc = spark.createDataFrame([("a", "b"), ("b", "a")],
                                "src string, dst string")
    stats = {}
    out = {r["vertex"]: (r["hub"], r["auth"])
           for r in hits(cyc, iters=8, stats=stats).collect()}
    full = {r["vertex"]: (r["hub"], r["auth"])
            for r in hits(cyc, iters=8, tol=None).collect()}
    assert stats["iterations"] < 8
    assert out == full == {"a": (0.5, 0.5), "b": (0.5, 0.5)}
