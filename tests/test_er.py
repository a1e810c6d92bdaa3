"""Fuzzy entity resolution (functions/er.py) vs a brute-force
pure-Python replica: blocking COMPLETENESS (the SSJoin prefix-filter
bound — no pair within the distance threshold may escape), verify
precision, short-name sentinel edges, transitive resolution, and a
plan pin that the blocking join is an equi-join (never a cartesian)."""

import random

import pytest
from pyspark.sql import functions as F


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _norm(name: str) -> str:
    toks = [t for t in "".join(
        c if c.isalnum() else " " for c in name.lower()).split() if t]
    return " ".join(sorted(toks))


def _py_match(rows, max_dist=2):
    norm = {i: _norm(n) for i, n in rows}
    ids = sorted(norm)
    out = {}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            d = _lev(norm[a], norm[b])
            if d <= max_dist:
                out[(a, b)] = d
    return out


def _spark_match(spark, rows, max_dist=2):
    from neleval_spark.functions.er import er_match

    df = spark.createDataFrame(list(rows), "id string, name string")
    return {(r["id_a"], r["id_b"]): r["dist"]
            for r in er_match(df, max_dist=max_dist).collect()}


def test_hand_checked(spark):
    rows = [
        ("b:small ring", "small ring"),
        ("s:small ring", "ring  SMALL"),   # swap + case + spaces -> 0
        ("d:small ring", "smll ring"),     # dropped char -> 1
        ("t:small ring", "smal ringo"),    # two edits -> 2
        ("x:other", "completely different"),
    ]
    got = _spark_match(spark, rows)
    assert got == _py_match(rows)
    assert got[("b:small ring", "s:small ring")] == 0
    assert got[("b:small ring", "d:small ring")] == 1
    assert got[("b:small ring", "t:small ring")] == 2
    assert not any("x:other" in p for p in got)


def test_short_names_use_sentinel_block(spark):
    # gram-count bound is vacuous for these; the #SHORT block must
    # still pair them (ab~ax dist 1, ab~'' dist 2)
    rows = [("a:ab", "ab"), ("b:ax", "ax"), ("c:", ""), ("d:zz", "zz")]
    got = _spark_match(spark, rows)
    assert got == _py_match(rows)
    assert ("a:ab", "b:ax") in got


@pytest.mark.parametrize("seed", [11, 23])
def test_fuzz_vs_bruteforce(spark, seed):
    """Random names + random ≤2-edit perturbations: the blocked
    matcher must return EXACTLY the brute-force pair set — this is
    the completeness proof of the d*q+1 prefix in action."""
    rng = random.Random(seed)
    words = ["red", "blue", "ring", "bolt", "widget", "spring",
             "acme", "corp", "ltd", "x"]
    rows = []
    for i in range(40):
        name = " ".join(rng.choice(words)
                        for _ in range(rng.randint(1, 3)))
        rows.append((f"r{i:03d}", name))
        if rng.random() < 0.6:
            s = list(name)
            for _ in range(rng.randint(1, 2)):
                op = rng.choice("ids")
                p = rng.randrange(len(s)) if s else 0
                if op == "i" or not s:
                    s.insert(p, rng.choice("abcxyz"))
                elif op == "d":
                    s.pop(p)
                else:
                    s[p] = rng.choice("abcxyz")
            rows.append((f"v{i:03d}", "".join(s)))
    assert _spark_match(spark, rows) == _py_match(rows)


def test_resolve_transitive_and_covering(spark):
    from neleval_spark.functions.er import er_resolve

    # chain a-b-c (a~b dist 1, b~c dist 1, a~c dist 2) + singleton
    rows = [("a", "acme corp"), ("b", "acme cord"), ("c", "acme cords"),
            ("z", "unrelated name entirely")]
    df = spark.createDataFrame(rows, "id string, name string")
    got = {r["id"]: (r["canonical"], r["cluster_size"])
           for r in er_resolve(df).collect()}
    assert got == {"a": ("a", 3), "b": ("a", 3), "c": ("a", 3),
                   "z": ("z", 1)}


def test_blocking_is_equi_join(spark):
    """Plan pin: candidate generation must join on the gram key —
    no BroadcastNestedLoopJoin / CartesianProduct anywhere."""
    from neleval_spark.functions.er import er_candidates

    df = spark.createDataFrame(
        [("a", "x y"), ("b", "y x")], "id string, name string")
    plan = (er_candidates(df)._jdf.queryExecution()
            .executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_normalize_name_column(spark):
    from neleval_spark.functions.er import normalize_name

    df = spark.createDataFrame(
        [("  Acme,  CORP!  42 ",), ("",)], "s string")
    vals = [r["n"] for r in
            df.select(normalize_name(F.col("s")).alias("n")).collect()]
    assert vals == ["42 acme corp", ""]

def _py_increment(new_rows, index_rows, max_dist=2):
    """Ground truth: every (new, index) pair within max_dist, plus
    within-batch pairs keyed by the larger id (first-wins)."""
    out = {}
    for ni, nn in new_rows:
        for xi, xn in index_rows:
            if ni == xi:
                continue
            d = _lev(_norm(nn), _norm(xn))
            if d <= max_dist:
                out[(ni, xi, True)] = d
    for (a, b), d in _py_match(new_rows, max_dist).items():
        out[(b, a, False)] = d
    return out


def _spark_increment(spark, new_rows, index_rows, max_dist=2):
    from neleval_spark.functions.er import er_increment, er_index

    idx = er_index(spark.createDataFrame(
        list(index_rows), "id string, name string"))
    new = spark.createDataFrame(list(new_rows),
                                "id string, name string")
    return {(r["new_id"], r["match_id"], r["is_index"]): r["dist"]
            for r in er_increment(new, idx,
                                  max_dist=max_dist).collect()}


def test_increment_hand_checked(spark):
    index = [("i1", "acme corp"), ("i2", "beta labs"), ("i3", "ab")]
    new = [("n1", "acme cor"),      # matches i1 (dist 1)
           ("n2", "acme core"),     # matches i1 (dist 1) and n1
           ("n3", "az"),            # short-short vs i3 (dist 1)
           ("n4", "completely novel name")]
    got = _spark_increment(spark, new, index)
    assert got == _py_increment(new, index)
    assert got[("n1", "i1", True)] == 1
    assert got[("n2", "n1", False)] == 1
    assert got[("n3", "i3", True)] == 1
    assert not any(k[0] == "n4" for k in got)


def test_increment_gram_frequency_drift(spark):
    """The index was built when 'zz' grams were rare; the increment's
    own frequency order is completely different.  Completeness must
    not depend on any shared order (the index keeps ALL grams)."""
    index = [(f"i{k}", f"zzz common {k}") for k in range(20)] + \
        [("it", "rare target name")]
    new = [("n0", "rare target nam")] + \
        [(f"n{k+1}", f"zzz common {k}x") for k in range(20)]
    got = _spark_increment(spark, new, index)
    assert got == _py_increment(new, index)
    assert ("n0", "it", True) in got


@pytest.mark.parametrize("seed", [7])
def test_increment_fuzz_vs_bruteforce(spark, seed):
    rng = random.Random(seed)
    words = ["red", "blue", "ring", "bolt", "widget", "acme", "ab"]

    def gen(prefix, n):
        rows = []
        for i in range(n):
            name = " ".join(rng.choice(words)
                            for _ in range(rng.randint(1, 3)))
            s = list(name)
            for _ in range(rng.randint(0, 2)):
                p = rng.randrange(len(s))
                s[p] = rng.choice("abxyz")
            rows.append((f"{prefix}{i:03d}", "".join(s)))
        return rows

    index, new = gen("i", 30), gen("n", 25)
    assert _spark_increment(spark, new, index) == \
        _py_increment(new, index)


def test_increment_resubmitted_id_skips_self(spark):
    index = [("same", "acme corp")]
    new = [("same", "acme corp")]
    assert _spark_increment(spark, new, index) == {}
