"""Differential fuzz: the hash-driven walk family vs a pure-Python
replica of the same arithmetic (polynomial hash, two-phase index
permutation, uniform / biased picks, sink truncation).  Random small
graphs; Spark and the replica must agree path-for-path — the walk
analogue of the reference-fuzz nets the MEASURES have."""
from hypothesis import given, settings
from hypothesis import strategies as st

P = 2147483647
US = "\x1f"


def _phash(s: str) -> int:
    acc = 0
    for ch in s:
        acc = (acc * 31 + ord(ch)) % P
    return acc


def _indexed(edges, n_sub):
    by = {}
    for s, d in edges:
        by.setdefault(s, set()).add(d)
    out = {}
    for s, ds in by.items():
        key = lambda d: (_phash(s + US + d) % n_sub,  # noqa: E731
                         _phash(s + US + d), d)
        out[s] = sorted(ds, key=key)
    return out


def _py_random_walk(node, wid, walk_len, idx):
    path, cur = [node], node
    for step in range(1, walk_len + 1):
        ds = idx.get(cur)
        if not ds:
            break
        pick = _phash(US.join([node, cur, str(wid),
                               str(step)])) % len(ds)
        cur = ds[pick]
        path.append(cur)
    return path


def _py_node2vec_walk(node, wid, walk_len, idx, edge_set,
                      w_return, w_near, w_far):
    path, prev, cur = [node], None, node
    ds = idx.get(cur)
    if ds:
        pick = _phash(US.join([node, cur, str(wid), "1"])) % len(ds)
        prev, cur = cur, ds[pick]
        path.append(cur)
    for step in range(2, walk_len + 1):
        ds = idx.get(cur)
        if not ds:
            break
        ws = []
        for d in ds:
            if d == prev:
                ws.append(w_return)
            elif (prev, d) in edge_set:
                ws.append(w_near)
            else:
                ws.append(w_far)
        total = sum(ws)
        r = _phash(US.join([node, prev, cur, str(wid),
                            str(step)])) % total
        cum = 0
        for d, w in zip(ds, ws):
            cum += w
            if r < cum:
                prev, cur = cur, d
                path.append(cur)
                break
    return path


_edges_strategy = st.lists(
    st.tuples(st.sampled_from("abcdef"), st.sampled_from("abcdef")),
    min_size=1, max_size=18, unique=True)


@settings(max_examples=12, deadline=None)
@given(edges=_edges_strategy, n_sub=st.sampled_from([1, 2, 4]))
def test_random_walks_match_python_replica(spark, edges, n_sub):
    from neleval_spark.graph.walks import random_walks

    df = spark.createDataFrame(edges, "src string, dst string")
    got = {(r["node"], r["walk_id"]): list(r["path"]) for r in
           random_walks(df, walk_len=4, n_walks=2,
                        n_sub=n_sub).collect()}
    idx = _indexed(edges, n_sub)
    for node in {s for s, _ in edges}:
        for wid in (0, 1):
            assert got[(node, wid)] == _py_random_walk(
                node, wid, 4, idx), (node, wid, edges, n_sub)


@settings(max_examples=10, deadline=None)
@given(edges=_edges_strategy,
       weights=st.sampled_from([(1, 4, 2), (3, 1, 5), (1, 1, 1)]))
def test_node2vec_matches_python_replica(spark, edges, weights):
    from neleval_spark.graph.walks import node2vec_walks

    wr, wn, wf = weights
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {(r["node"], r["walk_id"]): list(r["path"]) for r in
           node2vec_walks(df, walk_len=3, n_walks=2, w_return=wr,
                          w_near=wn, w_far=wf, n_sub=2).collect()}
    idx = _indexed(edges, 2)
    eset = set(edges)
    for node in {s for s, _ in edges}:
        for wid in (0, 1):
            assert got[(node, wid)] == _py_node2vec_walk(
                node, wid, 3, idx, eset, wr, wn, wf), \
                (node, wid, edges, weights)
