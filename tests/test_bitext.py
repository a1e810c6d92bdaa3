"""Margin-based bitext mining (functions/bitext.mine_bitext):
planted-pair recovery, hubness demotion (the reason margin exists),
mutual-best 1:1-ness, and partitioning invariance."""
from pyspark.sql import functions as F


def _vecs(spark, rows, id_col, vec_col):
    return spark.createDataFrame(
        rows, f"{id_col} long, {vec_col} array<double>")


def _planted(n, dim=16, seed=7):
    """n src/tgt vector pairs: tgt i = src i slightly rotated, plus
    deterministic noise dims — same-i pairs are the true alignment."""
    def v(i, side):
        base = [((i * 31 + d * 17 + seed) % 97) / 97.0 - 0.5
                for d in range(dim)]
        if side:
            base = [x + (((i + d) % 5) - 2) * 0.01 for d, x in
                    enumerate(base)]
        return base
    src = [(i, v(i, 0)) for i in range(n)]
    tgt = [(i + 1000, v(i, 1)) for i in range(n)]
    return src, tgt


def test_planted_pairs_recovered(spark):
    from neleval_spark.functions.bitext import mine_bitext

    src_rows, tgt_rows = _planted(12)
    src = _vecs(spark, src_rows, "sid", "sv")
    tgt = _vecs(spark, tgt_rows, "tid", "tv")
    got = {(r["sid"], r["tid"]): r["margin"]
           for r in mine_bitext(src, tgt, k=3, threshold=1.0,
                                n_tables=8).collect()}
    # every plant is recovered, and nothing else is mined
    assert set(got) == {(i, i + 1000) for i in range(12)}
    # margins clear the threshold; pairs whose sides saw competing
    # candidates beat their neighbourhood average strictly
    assert all(m >= 1.0 for m in got.values())
    assert any(m > 1.1 for m in got.values())


def test_mutual_is_one_to_one_and_subset(spark):
    from neleval_spark.functions.bitext import mine_bitext

    src_rows, tgt_rows = _planted(10)
    src = _vecs(spark, src_rows, "sid", "sv")
    tgt = _vecs(spark, tgt_rows, "tid", "tv")
    loose = {(r["sid"], r["tid"])
             for r in mine_bitext(src, tgt, k=3, threshold=0.0,
                                  mutual=False,
                                  n_tables=8).collect()}
    strict = [(r["sid"], r["tid"])
              for r in mine_bitext(src, tgt, k=3, threshold=0.0,
                                   mutual=True,
                                   n_tables=8).collect()]
    assert set(strict) <= loose
    sids = [s for s, _ in strict]
    tids = [t for _, t in strict]
    assert len(sids) == len(set(sids)) and len(tids) == len(set(tids))


def test_hub_demoted_by_margin(spark):
    """A tgt hub close to EVERY src (high raw cosine everywhere) has
    a high neighbourhood average, so its margins sit near 1 while a
    planted exclusive pair scores well above — raw cosine cannot
    make that separation."""
    from neleval_spark.functions.bitext import mine_bitext

    dim = 8
    base = [1.0] * dim
    src_rows = [(i, [1.0 + 0.05 * ((i + d) % 3) for d in range(dim)])
                for i in range(6)]
    hub = (100, base)  # ~parallel to every src
    # tgt 101 is (noisily) aligned with src 5 only
    special = (101, [x + (0.4 if d % 2 else -0.4)
                     for d, x in enumerate(src_rows[5][1])])
    src = _vecs(spark, src_rows, "sid", "sv")
    tgt = _vecs(spark, [hub, special], "tid", "tv")
    out = mine_bitext(src, tgt, k=3, threshold=0.0, mutual=False,
                      n_tables=8).collect()
    hub_margins = [r["margin"] for r in out if r["tid"] == 100]
    # hub margins hug 1.0: cos ~= its own neighbourhood average
    assert hub_margins and max(hub_margins) < 1.1


def test_partitioning_invariance(spark):
    from neleval_spark.functions.bitext import mine_bitext

    src_rows, tgt_rows = _planted(10)
    a = mine_bitext(_vecs(spark, src_rows, "sid", "sv"),
                    _vecs(spark, tgt_rows, "tid", "tv"),
                    k=3, threshold=1.0, n_tables=8).collect()
    b = mine_bitext(_vecs(spark, src_rows, "sid", "sv").repartition(7),
                    _vecs(spark, tgt_rows, "tid", "tv").repartition(3),
                    k=3, threshold=1.0, n_tables=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_norms_staged_below_join(spark):
    """The per-row norm folds must SURVIVE optimization below the
    pair join: the per-pair projection (the one holding the zip_with
    dot product) must not contain a sqrt — a re-inlined norm would
    put the whole cosine family back at three interpreted folds per
    candidate pair (PLANS.md 'cosine family')."""
    from neleval_spark.functions.bitext import mine_bitext
    from neleval_spark.functions.similarity import (ann_lsh_topk,
                                                    cosine_topk)

    src_rows, tgt_rows = _planted(6)
    src = _vecs(spark, src_rows, "sid", "sv")
    tgt = _vecs(spark, tgt_rows, "tid", "tv")
    for out in (
        mine_bitext(src, tgt, k=2, threshold=0.0, n_tables=8),
        ann_lsh_topk(
            src.withColumnRenamed("sid", "qid")
               .withColumnRenamed("sv", "qv"),
            tgt.withColumnRenamed("tid", "cid")
               .withColumnRenamed("tv", "cv"), k=2, n_tables=8),
        cosine_topk(
            src.withColumnRenamed("sid", "qid")
               .withColumnRenamed("sv", "qv"),
            tgt.withColumnRenamed("tid", "cid")
               .withColumnRenamed("tv", "cv"), k=2),
    ):
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        pair_lines = [ln for ln in plan.split("\n")
                      if "zip_with" in ln]
        assert pair_lines, plan
        assert all("SQRT" not in ln.upper() for ln in pair_lines), \
            pair_lines
        assert "SQRT" in plan.upper()
