"""Bloom-filter membership (functions/bloom.py).

The contract that matters for dedup: NO false negatives ever (a
"definitely new" verdict is exact); false positives bounded near the
theoretical ``(1 - e^(-k n / m))^k``.
"""
import pyspark.sql.functions as F
import pytest


def _keys(spark, lo, hi, prefix="u"):
    return spark.range(lo, hi).select(
        F.concat(F.lit(prefix), F.col("id")).alias("key"))


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    from neleval_spark.functions.bloom import bloom_build, bloom_probe

    m, k = 1 << 14, 7
    seen = _keys(spark, 0, 1000)
    filt = bloom_build(seen, "key", m_bits=m, k_hashes=k)
    out = bloom_probe(_keys(spark, 0, 3000), filt,
                      "key", m_bits=m, k_hashes=k)
    agg = out.select(
        F.sum(F.when((F.col("maybe_seen") == 0)
                     & (F.expr("cast(substr(key, 2) as long)") < 1000),
                     1).otherwise(0)).alias("fn"),
        F.sum(F.when((F.col("maybe_seen") == 1)
                     & (F.expr("cast(substr(key, 2) as long)") >= 1000),
                     1).otherwise(0)).alias("fp"),
    ).first()
    assert agg["fn"] == 0, "Bloom filters must never false-negative"
    # theory at m/n=16.4, k=7 is ~0.06%; allow an order of magnitude
    # slack for the 31-bit polynomial hash family
    assert agg["fp"] <= 20, f"FP rate out of control: {agg['fp']}/2000"


def test_bloom_filter_is_word_bounded(spark):
    """The filter never exceeds m_bits/64 rows no matter how many
    keys go in — that is the whole point of the sketch."""
    from neleval_spark.functions.bloom import bloom_build

    m = 1 << 10
    filt = bloom_build(_keys(spark, 0, 5000), "key",
                       m_bits=m, k_hashes=5)
    assert filt.count() <= m // 64
    # saturated filter: every word present, all a BIGINT can hold
    assert filt.agg(F.min("word")).first()[0] >= 0


def test_bloom_hashes_staged_once_per_key(spark):
    """The two polynomial folds are interpreted higher-order
    functions — they must survive as staged _h1/_h2 columns computed
    BEFORE the k-way explode, not inlined per (key, i)."""
    from neleval_spark.functions.bloom import bloom_build

    plan = bloom_build(_keys(spark, 0, 10), "key")._jdf \
        .queryExecution().optimizedPlan().toString()
    assert "_h1" in plan and "_h2" in plan, "hash staging inlined"


def test_bloom_probe_annotates_not_reduces(spark):
    """Probe joins verdicts back per distinct key: duplicate probe
    rows each keep their verdict, extra columns survive."""
    from neleval_spark.functions.bloom import bloom_build, bloom_probe

    seen = _keys(spark, 0, 10)
    filt = bloom_build(seen, "key", m_bits=1 << 12, k_hashes=5)
    probe = spark.createDataFrame(
        [("u1", "a"), ("u1", "b"), ("u99999", "c")],
        "key string, tag string")
    rows = {(r["key"], r["tag"]): r["maybe_seen"]
            for r in bloom_probe(probe, filt, "key",
                                 m_bits=1 << 12, k_hashes=5).collect()}
    assert len(rows) == 3
    assert rows[("u1", "a")] == 1 and rows[("u1", "b")] == 1
    assert rows[("u99999", "c")] == 0
