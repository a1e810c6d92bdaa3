"""SDValidate-style type-consistency plausibility: hand-built
signature/score cases (multi-typed max, untyped sentinel,
fresh-batch zero support, duplicate-assertion immunity) plus a
seeded random-KG differential vs a pure-Python replica."""

import random

from neleval_spark.pipeline.plausibility import (
    UNTYPED_SCORE, predicate_type_signature, score_triples)

TRIPLES_SCHEMA = "subj string, pred string, obj string"
TYPES_SCHEMA = "entity string, type string"
DENOM = 1_000_000


def _sig(spark, triples, types, side="obj"):
    s = predicate_type_signature(
        spark.createDataFrame(triples, TRIPLES_SCHEMA),
        spark.createDataFrame(types, TYPES_SCHEMA), side=side)
    return {(r["pred"], r["type"]): (r["support"], r["pred_total"])
            for r in s.collect()}


def test_signature_counts_and_totals(spark):
    triples = [("a", "born_in", "paris"), ("b", "born_in", "lyon"),
               ("c", "born_in", "acme"), ("d", "born_in", "unknown"),
               ("a", "works_at", "acme"),
               ("a", "born_in", "paris")]  # duplicate: no inflation
    types = [("paris", "place"), ("lyon", "place"), ("acme", "org"),
             ("paris", "entity")]
    got = _sig(spark, triples, types)
    # 'unknown' has no type row: excluded from support AND total
    assert got[("born_in", "place")] == (2, 3)
    assert got[("born_in", "org")] == (1, 3)
    assert got[("born_in", "entity")] == (1, 3)
    assert got[("works_at", "org")] == (1, 1)


def test_score_max_over_types_and_sentinels(spark):
    triples = [("a", "born_in", "paris"), ("b", "born_in", "lyon"),
               ("c", "born_in", "acme"), ("d", "born_in", "unknown")]
    types = [("paris", "place"), ("lyon", "place"), ("acme", "org"),
             ("acme", "place")]  # multi-typed: max wins
    t = spark.createDataFrame(triples, TRIPLES_SCHEMA)
    ty = spark.createDataFrame(types, TYPES_SCHEMA)
    sig = predicate_type_signature(t, ty)
    got = {(r["subj"], r["obj"]): r["plaus_ppm"]
           for r in score_triples(t, sig, ty).collect()}
    assert got[("a", "paris")] == 3 * DENOM // 3  # place: 3/3
    assert got[("c", "acme")] == 3 * DENOM // 3   # max(place, org)
    assert got[("d", "unknown")] == UNTYPED_SCORE


def test_fresh_batch_zero_support_is_not_untyped(spark):
    trusted = [("a", "born_in", "paris")]
    types = [("paris", "place"), ("acme", "org")]
    t = spark.createDataFrame(trusted, TRIPLES_SCHEMA)
    ty = spark.createDataFrame(types, TYPES_SCHEMA)
    sig = predicate_type_signature(t, ty)
    fresh = spark.createDataFrame(
        [("x", "born_in", "acme"),      # typed, zero signature support
         ("y", "born_in", "nowhere")],  # untyped
        TRIPLES_SCHEMA)
    got = {r["subj"]: r["plaus_ppm"]
           for r in score_triples(fresh, sig, ty).collect()}
    assert got["x"] == 0
    assert got["y"] == UNTYPED_SCORE


def test_subject_side(spark):
    triples = [("paris", "in_country", "france"),
               ("acme", "in_country", "france")]
    types = [("paris", "place"), ("acme", "org"), ("france", "place")]
    got = _sig(spark, triples, types, side="subj")
    assert got[("in_country", "place")] == (1, 2)
    assert got[("in_country", "org")] == (1, 2)


def _python_scores(triples, types, denom=DENOM):
    t3 = sorted(set(triples))
    ty = {}
    for e, x in set(types):
        ty.setdefault(e, set()).add(x)
    support, total = {}, {}
    for s, p, o in t3:
        if o in ty:
            total[p] = total.get(p, 0) + 1
            for x in ty[o]:
                support[(p, x)] = support.get((p, x), 0) + 1
    out = {}
    for s, p, o in t3:
        if o not in ty:
            out[(s, p, o)] = UNTYPED_SCORE
        else:
            out[(s, p, o)] = max(
                support.get((p, x), 0) * denom // total[p]
                for x in ty[o])
    return out


def test_random_kgs_vs_python_oracle(spark):
    rng = random.Random(90217)
    for trial in range(3):
        n_e, n_p, n_t = 14, 3, 4
        triples = sorted({
            (f"e{rng.randrange(n_e)}", f"p{rng.randrange(n_p)}",
             f"e{rng.randrange(n_e)}") for _ in range(40)})
        types = sorted({
            (f"e{rng.randrange(n_e)}", f"t{rng.randrange(n_t)}")
            for _ in range(18)})
        t = spark.createDataFrame(triples, TRIPLES_SCHEMA)
        ty = spark.createDataFrame(types, TYPES_SCHEMA)
        sig = predicate_type_signature(t, ty)
        got = {(r["subj"], r["pred"], r["obj"]): r["plaus_ppm"]
               for r in score_triples(t, sig, ty).collect()}
        assert got == _python_scores(triples, types), f"trial {trial}"
