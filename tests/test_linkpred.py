"""Link-prediction features (graph/linkpred.py) vs a pure-Python
replica: common neighbours / Jaccard / Adamic-Adar on hand-checked
and pseudo-random graphs, hub-cap accounting, existing-edge
handling."""
import math


def _py_linkpred(edges, include_existing=False, max_center=None):
    e = {tuple(sorted(t)) for t in edges if t[0] != t[1]}
    nbr = {}
    for a, b in e:
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    deg = {v: len(ns) for v, ns in nbr.items()}
    out = {}
    for z, ns in nbr.items():
        if max_center is not None and deg[z] > max_center:
            continue
        ns = sorted(ns)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                u, w = ns[i], ns[j]
                cn, aa = out.get((u, w), (0, 0.0))
                out[(u, w)] = (cn + 1, aa + 1.0 / math.log(deg[z]))
    res = {}
    for (u, w), (cn, aa) in out.items():
        if not include_existing and (u, w) in e:
            continue
        jac = cn / (deg[u] + deg[w] - cn)
        res[(u, w)] = (cn, round(jac, 6), round(aa, 6))
    return res


def _df(spark, edges):
    return spark.createDataFrame(list(edges), "src string, dst string")


def test_triangle_plus_tail(spark):
    from neleval_spark.graph.linkpred import link_prediction

    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "t")]
    got = {(r["u"], r["w"]): (r["common_neighbors"], r["jaccard"],
                              r["adamic_adar"])
           for r in link_prediction(_df(spark, edges)).collect()}
    # only non-edges at distance 2: (a,t) and (b,t) via c (deg 3);
    # jaccard = |{c}| / |{b,c} ∪ {c}| = 1/2
    inv = round(1.0 / math.log(3), 6)
    assert got == {("a", "t"): (1, 0.5, inv),
                   ("b", "t"): (1, 0.5, inv)}


def test_matches_python_replica(spark):
    from neleval_spark.graph.linkpred import link_prediction

    edges = [(f"v{(i * 7) % 19}", f"v{(i * i + 2) % 19}")
             for i in range(50)]
    for inc in (False, True):
        got = {(r["u"], r["w"]): (r["common_neighbors"], r["jaccard"],
                                  r["adamic_adar"])
               for r in link_prediction(
                   _df(spark, edges), include_existing=inc).collect()}
        assert got == _py_linkpred(edges, include_existing=inc), inc


def test_hub_cap_excludes_centers(spark):
    from neleval_spark.graph.linkpred import link_prediction

    hub = [("hub", f"s{i}") for i in range(20)]
    tri = [("s0", "s1"), ("s1", "s2")]
    stats = {}
    got = {(r["u"], r["w"]): (r["common_neighbors"], r["jaccard"],
                              r["adamic_adar"])
           for r in link_prediction(_df(spark, hub + tri),
                                    max_center_degree=5,
                                    stats=stats).collect()}
    assert stats["n_centers_excluded"] == 1  # the hub
    # hub-witnessed pairs are gone; s0-s2 (witness s1, deg 3) stays
    assert got == _py_linkpred(hub + tri, max_center=5)
    assert ("s0", "s2") in got
