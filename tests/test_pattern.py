"""Basic-graph-pattern queries (graph/pattern.py)."""

import pytest

from neleval_spark.graph.pattern import match_pattern


def _triples(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string")


KG = [
    ("alice", "type", "Person"),
    ("bob", "type", "Person"),
    ("acme", "type", "Org"),
    ("alice", "works_for", "acme"),
    ("bob", "works_for", "acme"),
    ("alice", "knows", "bob"),
    ("acme", "located_in", "berlin"),
    ("selfy", "knows", "selfy"),
]


def test_chain_join(spark):
    t = _triples(spark, KG)
    out = match_pattern(t, [
        ("?p", "type", "Person"),
        ("?p", "works_for", "?o"),
        ("?o", "located_in", "?c"),
    ])
    assert sorted(out.columns) == ["c", "o", "p"]
    got = {tuple(r) for r in out.collect()}
    assert got == {("berlin", "acme", "alice"),
                   ("berlin", "acme", "bob")}


def test_constant_subject_and_existence(spark):
    t = _triples(spark, KG)
    # ground pattern present -> existence check passes
    out = match_pattern(t, [
        ("alice", "knows", "?x"),
        ("acme", "located_in", "berlin"),
    ])
    assert [tuple(r) for r in out.collect()] == [("bob",)]
    # ground pattern absent -> empty result
    out = match_pattern(t, [
        ("alice", "knows", "?x"),
        ("acme", "located_in", "paris"),
    ])
    assert out.count() == 0


def test_all_ground(spark):
    t = _triples(spark, KG)
    assert match_pattern(
        t, [("alice", "knows", "bob")]).collect()[0][0] == 1
    assert match_pattern(
        t, [("bob", "knows", "alice")]).count() == 0


def test_repeated_variable_same_row(spark):
    t = _triples(spark, KG)
    out = match_pattern(t, [("?x", "knows", "?x")])
    assert [tuple(r) for r in out.collect()] == [("selfy",)]


def test_set_semantics_no_multiplication(spark):
    # duplicate triple rows (one per witnessing url at scale) must
    # not multiply solutions
    t = _triples(spark, KG + KG + KG)
    out = match_pattern(t, [
        ("?p", "type", "Person"), ("?p", "works_for", "?o")])
    assert out.count() == 2


def test_disconnected_raises_unless_allowed(spark):
    t = _triples(spark, KG)
    with pytest.raises(ValueError, match="disconnected"):
        match_pattern(t, [("?a", "type", "Person"),
                          ("?b", "located_in", "?c")])
    out = match_pattern(t, [("?a", "type", "Person"),
                            ("?b", "located_in", "?c")],
                        allow_product=True)
    assert out.count() == 2  # 2 persons x 1 located_in


def test_filters_pushed_to_scan(spark, tmp_path):
    # constant pred/obj must reach the parquet scan as PushedFilters
    p = str(tmp_path / "t.parquet")
    _triples(spark, KG).write.parquet(p)
    t = spark.read.parquet(p)
    out = match_pattern(t, [("?p", "type", "Person"),
                            ("?p", "works_for", "?o")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "IsNotNull" in plan or "EqualTo" in plan
    got = {tuple(r) for r in out.collect()}
    assert got == {("acme", "alice"), ("acme", "bob")}
