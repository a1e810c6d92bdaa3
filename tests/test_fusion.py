"""Knowledge fusion (pipeline/fusion.py): iterated source-trust fact
resolution (differential against a pure-Python reference) and
PARIS-style predicate alignment."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from neleval_spark.pipeline.fusion import (
    align_predicates, fuse_facts, source_trust)

SCALE = 1_000_000


def _py_fuse(claims, n_iter=2, scale=SCALE):
    """Driver-side reference: same unrolled integer fixed-point."""
    claims = sorted(set(claims))
    sources = {s for s, *_ in claims}
    trust = {s: scale for s in sources}

    def beliefs(trust):
        conf, nsrc = {}, {}
        for s, subj, pred, obj in claims:
            f = (subj, pred, obj)
            conf[f] = conf.get(f, 0) + trust[s]
            nsrc[f] = nsrc.get(f, 0) + 1
        total, nobj = {}, {}
        for (subj, pred, obj), c in conf.items():
            k = (subj, pred)
            total[k] = total.get(k, 0) + c
            nobj[k] = nobj.get(k, 0) + 1
        bel = {f: conf[f] * scale // total[f[:2]] for f in conf}
        return bel, nsrc, nobj

    def trust_update(bel):
        acc, n = {}, {}
        for s, subj, pred, obj in claims:
            acc[s] = acc.get(s, 0) + bel[(subj, pred, obj)]
            n[s] = n.get(s, 0) + 1
        return {s: acc[s] // n[s] for s in acc}, n

    bel, nsrc, nobj = beliefs(trust)
    for _ in range(n_iter - 1):
        trust, _ = trust_update(bel)
        bel, nsrc, nobj = beliefs(trust)
    winners = {}
    for (subj, pred, obj), b in bel.items():
        k = (subj, pred)
        cand = (-b, obj)
        if k not in winners or cand < winners[k][0]:
            winners[k] = (cand, obj, b,
                          nsrc[(subj, pred, obj)], nobj[k])
    final_trust, n_claims = trust_update(bel)
    facts = {(k[0], k[1], w[1]): (w[2], w[3], w[4])
             for k, w in winners.items()}
    return facts, {s: (final_trust[s], n_claims[s]) for s in final_trust}


def _synthetic_claims():
    """Deterministic conflict-rich corpus: 12 sources, 20 keys.

    Sources h0-h7 are honest (claim the key's canonical object on the
    keys they cover); h8-h11 are corrupt on a sliding subset (claim a
    wrong object), so trust separates and some beliefs move between
    sweeps.  Duplicate claim rows injected to exercise the dedup.
    """
    rows = []
    for k in range(20):
        subj, good = f"E{k}", f"C{k}"
        for s in range(12):
            if (k + s) % 3 == 0:
                continue  # sparse coverage
            if s >= 8 and (k + s) % 2 == 0:
                obj = f"W{(k + s) % 4}"  # corrupt claim
            else:
                obj = good
            rows.append((f"h{s}", subj, "born_in", obj))
    rows += rows[:7]  # duplicates must collapse to one vote
    return rows


def test_fuse_matches_python_reference(spark):
    rows = _synthetic_claims()
    df = spark.createDataFrame(rows, ["source", "subj", "pred", "obj"])
    got = {(r.subj, r.pred, r.obj): (r.belief, r.n_sources, r.n_objects)
           for r in fuse_facts(df, n_iter=3).collect()}
    want_facts, want_trust = _py_fuse(rows, n_iter=3)
    assert got == want_facts
    got_trust = {r.source: (r.trust, r.n_claims)
                 for r in source_trust(df, n_iter=3).collect()}
    assert got_trust == want_trust
    # corrupt sources must end strictly less trusted than honest ones
    assert max(got_trust[f"h{s}"][0] for s in range(8, 12)) < \
        min(got_trust[f"h{s}"][0] for s in range(8))


def test_fuse_mechanics(spark):
    rows = [
        # unanimous key: belief == scale
        ("a", "E1", "p", "x"), ("b", "E1", "p", "x"),
        # 2v1 with uniform trust: majority wins 666666 / 333333
        ("a", "E2", "p", "y"), ("b", "E2", "p", "y"),
        ("c", "E2", "p", "z"),
        # single-source key
        ("c", "E3", "p", "w"),
    ]
    df = spark.createDataFrame(rows, ["source", "subj", "pred", "obj"])
    one = {(r.subj, r.obj): (r.belief, r.n_sources, r.n_objects)
           for r in fuse_facts(df, n_iter=1).collect()}
    assert one[("E1", "x")] == (SCALE, 2, 1)
    assert one[("E2", "y")] == (666_666, 2, 2)
    assert one[("E3", "w")] == (SCALE, 1, 1)
    # iteration strengthens the majority: c's trust falls below a/b,
    # so y's belief strictly rises in sweep 2
    two = {(r.subj, r.obj): r.belief
           for r in fuse_facts(df, n_iter=2).collect()}
    assert two[("E2", "y")] > 666_666
    assert two[("E1", "x")] == SCALE


_claims_strategy = st.lists(
    st.tuples(st.sampled_from(["s1", "s2", "s3", "s4"]),
              st.sampled_from(["E1", "E2", "E3"]),
              st.sampled_from(["p", "q"]),
              st.sampled_from(["x", "y", "z"])),
    min_size=1, max_size=20)


@settings(max_examples=10, deadline=None)
@given(claims=_claims_strategy, n_iter=st.sampled_from([1, 2, 3]))
def test_fuse_fuzz(spark, claims, n_iter):
    """Differential fuzz vs the pure-Python replica: arbitrary small
    claim sets (duplicates included), any sweep count — facts AND
    trust must match exactly (the fixed-point arithmetic is integer,
    so there is no tolerance)."""
    df = spark.createDataFrame(
        claims, "source string, subj string, pred string, obj string")
    got = {(r.subj, r.pred, r.obj): (r.belief, r.n_sources,
                                     r.n_objects)
           for r in fuse_facts(df, n_iter=n_iter).collect()}
    want_facts, want_trust = _py_fuse(claims, n_iter=n_iter)
    assert got == want_facts
    got_trust = {r.source: (r.trust, r.n_claims)
                 for r in source_trust(df, n_iter=n_iter).collect()}
    assert got_trust == want_trust


def test_align_predicates(spark):
    rows = []
    # born_in: pairs (E0,C0)..(E5,C5); place_of_birth: subset of 3;
    # works_at: disjoint object space; rare_pred: one shared pair
    # (min_support excludes); half_pred: 2 of its 8 pairs shared
    # (25% containment, pct filter excludes at 50)
    for k in range(6):
        rows.append(("born_in", f"E{k}", f"C{k}"))
    for k in range(3):
        rows.append(("place_of_birth", f"E{k}", f"C{k}"))
    for k in range(6):
        rows.append(("works_at", f"E{k}", f"W{k}"))
    rows.append(("rare_pred", "E0", "C0"))
    for k in range(2):
        rows.append(("half_pred", f"E{k}", f"C{k}"))
    for k in range(6):
        rows.append(("half_pred", f"X{k}", f"Y{k}"))
    rows += rows[:4]  # duplicate triples collapse
    df = spark.createDataFrame(rows, ["pred", "subj", "obj"])
    got = {(r.pred_a, r.pred_b): r
           for r in align_predicates(df, min_support=2,
                                     min_overlap_pct=50).collect()}
    # half_pred also clears the bar against place_of_birth alone
    # (2 shared of min(8,3)=3 → 66% containment)
    assert set(got) == {("born_in", "place_of_birth"),
                        ("half_pred", "place_of_birth")}
    r = got[("born_in", "place_of_birth")]
    assert (r.n_common, r.n_a, r.n_b) == (3, 6, 3)
    assert r.jaccard == 3 / 6 and r.containment_b == 1.0
    assert r.containment_a == 0.5
    # relaxing the pct filter admits the 25%-containment pair
    relaxed = {(r.pred_a, r.pred_b)
               for r in align_predicates(df, min_support=2,
                                         min_overlap_pct=20).collect()}
    assert ("born_in", "half_pred") in relaxed
    # min_support=1 admits the single-pair predicate
    loose = {(r.pred_a, r.pred_b)
             for r in align_predicates(df, min_support=1,
                                       min_overlap_pct=50).collect()}
    assert ("born_in", "rare_pred") in loose


def test_fusion_plan_pins(spark):
    """The scale claims in docs/PLANS.md 'kg_fuse'/'kg_align', pinned:
    trust/support tables join BROADCAST (2 hints each survive to the
    physical plan); the only shuffle join is the intended large-large
    one (trust update on the fact key / the pair self-join); no
    cartesian or nested-loop anywhere."""
    claims = spark.createDataFrame(
        [("a", "E1", "p", "x"), ("b", "E1", "p", "y")],
        ["source", "subj", "pred", "obj"])
    plan = fuse_facts(claims, n_iter=2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 2
    assert "Cartesian" not in plan and "NestedLoop" not in plan
    triples = spark.createDataFrame(
        [("p1", "s", "o")], ["pred", "subj", "obj"])
    plan = align_predicates(triples) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 2
    assert "Cartesian" not in plan and "NestedLoop" not in plan


def test_fuse_tiebreak_and_validation(spark):
    # exact tie (same trust mass): lexicographically smallest obj wins
    rows = [("a", "E1", "p", "zz"), ("b", "E1", "p", "aa")]
    df = spark.createDataFrame(rows, ["source", "subj", "pred", "obj"])
    [r] = fuse_facts(df, n_iter=2).collect()
    assert (r.obj, r.belief) == ("aa", SCALE // 2)
    with pytest.raises(ValueError):
        fuse_facts(df, n_iter=0)
    with pytest.raises(ValueError):
        source_trust(df, n_iter=0)
