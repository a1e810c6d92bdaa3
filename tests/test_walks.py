"""Deterministic DeepWalk-style random walks (graph/walks.py):
dense per-node edge indexing (two-phase), valid hop sequences,
sink truncation, partitioning-invariance."""
from pyspark.sql import functions as F


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def test_indexed_edges_dense_per_source(spark):
    from neleval_spark.graph.walks import indexed_edges

    e = _edges(spark, [("a", f"n{i}") for i in range(10)]
               + [("b", "a"), ("b", "c")])
    out = indexed_edges(e, n_sub=4).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["src"], []).append(r["idx"])
        assert r["degree"] == (10 if r["src"] == "a" else 2)
    assert sorted(by_src["a"]) == list(range(10))
    assert sorted(by_src["b"]) == [0, 1]


def test_random_walks_follow_real_edges_and_truncate(spark):
    from neleval_spark.graph.walks import random_walks

    rows = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
            ("b", "sink")]
    e = _edges(spark, rows)
    adj = {}
    for s, d in rows:
        adj.setdefault(s, set()).add(d)
    out = random_walks(e, walk_len=4, n_walks=3, n_sub=4).collect()
    # one walk per (source node, walk_id)
    assert len(out) == 3 * 3
    for r in out:
        path = list(r["path"])
        assert path[0] == r["node"]
        assert r["n_steps"] == len(path) - 1 <= 4
        for u, v in zip(path, path[1:]):
            assert v in adj[u], (u, v)
        # truncation is only legal at a sink
        if r["n_steps"] < 4:
            assert path[-1] not in adj


def test_random_walks_partitioning_invariant(spark):
    from neleval_spark.graph.walks import random_walks

    e = _edges(spark, [(f"n{i}", f"n{(i * 3 + 1) % 20}")
                       for i in range(20)]
               + [(f"n{i}", f"n{(i * 5 + 2) % 20}") for i in range(20)])
    key = lambda r: (r["node"], r["walk_id"], tuple(r["path"]))  # noqa
    w1 = sorted(map(key, random_walks(e, walk_len=5, n_walks=2,
                                      n_sub=4).collect()))
    w2 = sorted(map(key, random_walks(e.repartition(7), walk_len=5,
                                      n_walks=2, n_sub=4).collect()))
    assert w1 == w2


def test_indexed_edges_window_is_subbucketed(spark):
    """The indexing window must partition by (src, sub-bucket) —
    never by src alone (the round-4 hot-bucket lesson)."""
    from neleval_spark.graph.walks import indexed_edges

    e = _edges(spark, [("hub", f"n{i}") for i in range(50)])
    plan = (indexed_edges(e, n_sub=8)
            ._jdf.queryExecution().optimizedPlan().toString())
    # every row_number window spec must carry the _sub key
    rn = [line for line in plan.split("\n") if "row_number" in line]
    assert rn and all("_sub" in line for line in rn), rn


def test_sample_neighbors_fanout_cut(spark):
    from neleval_spark.graph.walks import sample_neighbors

    e = _edges(spark, [("hub", f"n{i}") for i in range(40)]
               + [("a", "b")])
    out = sample_neighbors(e, fanout=5, n_sub=4).collect()
    hub = [r for r in out if r["src"] == "hub"]
    assert len(hub) == 5
    assert sorted(r["idx"] for r in hub) == list(range(5))
    assert all(r["degree"] == 40 for r in hub)
    a = [r for r in out if r["src"] == "a"]
    assert len(a) == 1 and a[0]["degree"] == 1
    # deterministic across partitionings
    out2 = sample_neighbors(e.repartition(3), fanout=5,
                            n_sub=4).collect()
    assert sorted((r["src"], r["dst"]) for r in out) \
        == sorted((r["src"], r["dst"]) for r in out2)


def test_node2vec_return_and_far_bias(spark):
    from neleval_spark.graph.walks import node2vec_walks

    e = _edges(spark, [("a", "b"), ("b", "a"), ("b", "c"),
                       ("c", "a")])
    key = lambda r: (r["node"], r["walk_id"])  # noqa: E731
    ret = {key(r): list(r["path"]) for r in
           node2vec_walks(e, walk_len=4, n_walks=1,
                          w_return=10**6, w_near=1, w_far=1,
                          n_sub=4).collect()}
    # from a the only edge is a->b; with extreme return bias the
    # walk must ping-pong
    assert ret[("a", 0)] == ["a", "b", "a", "b", "a"]
    far = {key(r): list(r["path"]) for r in
           node2vec_walks(e, walk_len=4, n_walks=1,
                          w_return=1, w_near=1, w_far=10**6,
                          n_sub=4).collect()}
    assert far[("a", 0)] == ["a", "b", "c", "a", "b"]


def test_node2vec_near_bias_closes_triangles(spark):
    from neleval_spark.graph.walks import node2vec_walks

    # a -> b; from b: candidates c (a->c exists: distance 1) and
    # d (distance 2).  Extreme w_near must pick c; extreme w_far d.
    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "c"),
                       ("b", "d")])
    near = {r["node"]: list(r["path"]) for r in
            node2vec_walks(e, walk_len=2, n_walks=1,
                           w_return=1, w_near=10**6, w_far=1,
                           n_sub=4).collect()}
    assert near["a"][2] == "c", near["a"]
    far = {r["node"]: list(r["path"]) for r in
           node2vec_walks(e, walk_len=2, n_walks=1,
                          w_return=1, w_near=1, w_far=10**6,
                          n_sub=4).collect()}
    assert far["a"][2] == "d", far["a"]


def test_node2vec_max_degree_and_partitioning_invariance(spark):
    from neleval_spark.graph.walks import node2vec_walks

    e = _edges(spark, [("hub", f"n{i}") for i in range(30)]
               + [(f"n{i}", "hub") for i in range(30)])
    key = lambda r: (r["node"], r["walk_id"], tuple(r["path"]))  # noqa
    w1 = sorted(map(key, node2vec_walks(
        e, walk_len=3, n_walks=2, max_degree=5, n_sub=4).collect()))
    w2 = sorted(map(key, node2vec_walks(
        e.repartition(7), walk_len=3, n_walks=2, max_degree=5,
        n_sub=4).collect()))
    assert w1 == w2
    # the hub's first hop must land inside its 5-edge capped set
    from neleval_spark.graph.walks import sample_neighbors
    kept = {r["dst"] for r in
            sample_neighbors(e, fanout=5, n_sub=4).collect()
            if r["src"] == "hub"}
    for node, _wid, path in w1:
        if node == "hub":
            assert path[1] in kept, (path, kept)
