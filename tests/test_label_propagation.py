"""Label-propagation communities
(neleval_spark/graph/label_propagation.py): synchronized mode-LPA
values against an independent pure-python implementation with the
same min-label tie-break, determinism across partitionings,
early-stop ≡ fixed-count equivalence, and clique recovery."""

from pyspark.sql import functions as F


def _py_lpa(edges, iters):
    adj = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    lab = {v: v for v in adj}
    for _ in range(iters):
        new = {}
        for v, nbrs in adj.items():
            cnt = {lab[v]: 1}  # unit self-vote
            for u in nbrs:
                cnt[lab[u]] = cnt.get(lab[u], 0) + 1
            new[v] = min(cnt, key=lambda L: (-cnt[L], L))
        lab = new
    return lab


def _edges_df(spark, edges, parts=None):
    df = spark.createDataFrame(edges, "src string, dst string")
    return df.repartition(parts) if parts else df


TWO_CLIQUES = (
    [(a, b) for a in "abcd" for b in "abcd" if a < b]
    + [(a, b) for a in "efgh" for b in "efgh" if a < b]
    + [("d", "e")]  # one bridge
)


def test_lpa_matches_python_reference(spark):
    from neleval_spark.graph.label_propagation import label_propagation

    for edges in (
        TWO_CLIQUES,
        # star + chain + triangle with a dangling pair
        [("h", f"s{i}") for i in range(6)]
        + [("x1", "x2"), ("x2", "x3"), ("x3", "x4")]
        + [("t1", "t2"), ("t2", "t3"), ("t1", "t3"), ("p", "q")],
    ):
        for iters in (1, 2, 5):
            df = _edges_df(spark, edges)
            got = {r["vertex"]: r["label"]
                   for r in label_propagation(
                       df, iters=iters, early_stop=False).collect()}
            assert got == _py_lpa(edges, iters), (edges, iters)


def test_lpa_recovers_cliques(spark):
    from neleval_spark.graph.label_propagation import label_propagation

    df = _edges_df(spark, TWO_CLIQUES)
    got = {r["vertex"]: r["label"]
           for r in label_propagation(df, iters=5).collect()}
    assert len({got[v] for v in "abcd"}) == 1
    assert len({got[v] for v in "efgh"}) == 1
    assert got["a"] != got["h"]  # the bridge does not merge cliques


def test_lpa_partitioning_invariant_and_early_stop(spark):
    from neleval_spark.graph.label_propagation import label_propagation

    base = {r["vertex"]: r["label"]
            for r in label_propagation(
                _edges_df(spark, TWO_CLIQUES), iters=6,
                early_stop=False).collect()}
    for parts in (1, 7):
        stats = {}
        got = {r["vertex"]: r["label"]
               for r in label_propagation(
                   _edges_df(spark, TWO_CLIQUES, parts=parts),
                   iters=6, stats=stats).collect()}
        assert got == base, parts
        # two cliques settle fast; early stop must cut iterations
        assert stats["iterations"] < 6


def test_entity_communities_over_triples(spark):
    from neleval_spark.graph.label_propagation import (
        entity_communities)

    rows = ([("E1", "cooccurs_with", e) for e in ("E2", "E3")]
            + [("E2", "cooccurs_with", "E3"),
               ("E8", "cooccurs_with", "E9"),
               ("E5", "mentioned_in", "doc_1")])
    t = spark.createDataFrame(
        rows, "subj string, pred string, obj string")
    out = entity_communities(t, min_size=2).collect()
    by_entity = {r["entity"]: r for r in out}
    assert {by_entity[e]["community"]
            for e in ("E1", "E2", "E3")} == {"E1"}
    assert by_entity["E1"]["community_size"] == 3
    assert by_entity["E8"]["community"] == by_entity["E9"]["community"]
    # mentioned_in edges are not part of the co-occurrence graph
    assert "E5" not in by_entity and "doc_1" not in by_entity
    # deterministic ordering: size desc, community, entity
    assert [r["entity"] for r in out] == ["E1", "E2", "E3", "E8", "E9"]
