"""As-of join (neleval_spark/operators/asof.py) against the
independent pandas ``merge_asof`` implementation, plus edge cases
the union+window formulation must get right (inclusive equal-ts
match, no-preceding-snapshot nulls, tolerance, multi-column keys)."""

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from neleval_spark.operators.asof import asof_join


def _t(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_matches_pandas_merge_asof(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    n_q, n_s = 400, 300
    q = pd.DataFrame({
        "k": rng.integers(0, 8, n_q),
        "ts": [_t(float(x)) for x in rng.uniform(0, 1000, n_q)],
        "qid": np.arange(n_q),
    })
    s = pd.DataFrame({
        "k": rng.integers(0, 8, n_s),
        "ts": [_t(float(x)) for x in rng.uniform(0, 1000, n_s)],
        "v": rng.normal(size=n_s).round(6),
    })
    # merge_asof consumes the `on` column; carry the snapshot time
    # as an ordinary payload column to compare it too
    s["snap_ts"] = s["ts"]
    want = pd.merge_asof(
        q.sort_values("ts"), s.sort_values("ts"),
        on="ts", by="k", direction="backward",
    ).sort_values("qid").reset_index(drop=True)

    got = (
        asof_join(spark.createDataFrame(q),
                  spark.createDataFrame(s), on="k")
        .orderBy("qid")
        .toPandas()
    )
    assert list(got["qid"]) == list(want["qid"])
    pd.testing.assert_series_equal(
        got["r_v"], want["v"], check_names=False)
    pd.testing.assert_series_equal(
        got["r_snap_ts"], want["snap_ts"], check_names=False)


def test_asof_equal_ts_is_inclusive_and_missing_is_null(spark):
    left = _mk(spark, [(1, _t(10), "q1"), (1, _t(5), "q0"),
                       (2, _t(50), "q2")],
               "k int, ts timestamp, qid string")
    right = _mk(spark, [(1, _t(10), 100.0), (1, _t(7), 70.0)],
                "k int, ts timestamp, v double")
    got = {r["qid"]: (r["r_v"], r["r_ts"])
           for r in asof_join(left, right, on="k").collect()}
    # snapshot stamped exactly at the query time matches (inclusive)
    assert got["q1"] == (100.0, _t(10))
    # no snapshot at-or-before q0 -> nulls
    assert got["q0"] == (None, None)
    # key with no snapshots at all -> nulls
    assert got["q2"] == (None, None)


def test_asof_tolerance_nulls_stale_matches(spark):
    left = _mk(spark, [(1, _t(100), "a"), (1, _t(12), "b")],
               "k int, ts timestamp, qid string")
    right = _mk(spark, [(1, _t(10), 1.0)],
                "k int, ts timestamp, v double")
    got = {r["qid"]: r["r_v"]
           for r in asof_join(left, right, on="k",
                              tolerance=5.0).collect()}
    assert got["b"] == 1.0       # 2 s stale, inside tolerance
    assert got["a"] is None      # 90 s stale, nulled


def test_asof_multi_column_key_and_plan_shape(spark):
    left = _mk(spark, [("u1", "en", _t(9), 1), ("u1", "de", _t(9), 2)],
               "site string, lang string, ts timestamp, qid int")
    right = _mk(spark, [("u1", "en", _t(3), 30.0),
                        ("u1", "de", _t(4), 40.0)],
                "site string, lang string, ts timestamp, v double")
    df = asof_join(left, right, on=["site", "lang"])
    got = {r["qid"]: r["r_v"] for r in df.collect()}
    assert got == {1: 30.0, 2: 40.0}
    # plan: ONE exchange (the window partitioning), no join at all —
    # the union+window shape never materializes a range-join product
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]  # final plan only
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
