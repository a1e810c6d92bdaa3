"""Incremental MinHash-index dedup and streaming exact dedup:
cold-start + second-increment verdicts, first-wins intra-increment
semantics, replay idempotence of the index write, the broadcast plan
contract, and the watermark-bounded streaming operator."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from neleval_spark.functions.dedup_index import (
    check_increment, update_index)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


TEXT_A = "the quick brown fox jumps over the lazy dog again and again"
TEXT_B = "completely different content about spark shuffles and joins"
TEXT_C = "a third unique document mentioning watermarks and state"
TEXT_D = "yet another text on broadcast joins and partition pruning"


def test_cold_start_and_second_increment(spark, tmp_path):
    idx = str(tmp_path / "minhash_index")
    inc1 = _docs(spark, [(1, TEXT_A), (2, TEXT_B), (3, TEXT_C)])
    v1 = {r["doc_id"]: r for r in
          update_index(inc1, idx, run_id="inc-1").collect()}
    assert not any(v1[i]["is_duplicate"] for i in (1, 2, 3))
    assert spark.read.parquet(idx).count() == 3

    # increment 2: doc 10 duplicates indexed doc 1; doc 11 is new
    inc2 = _docs(spark, [(10, TEXT_A), (11, TEXT_D)])
    v2 = {r["doc_id"]: r for r in
          update_index(inc2, idx, run_id="inc-2").collect()}
    assert v2[10]["is_duplicate"] and v2[10]["dup_of"] == 1
    assert v2[10]["est_jaccard"] == 1.0
    assert not v2[11]["is_duplicate"]
    # only the canonical newcomer joined the index
    ids = {r["doc_id"] for r in
           spark.read.parquet(idx).select("doc_id").collect()}
    assert ids == {1, 2, 3, 11}


def test_intra_increment_first_wins(spark):
    inc = _docs(spark, [(5, TEXT_A), (6, TEXT_A), (7, TEXT_A)])
    v = {r["doc_id"]: r for r in
         check_increment(inc, None).collect()}
    assert not v[5]["is_duplicate"]          # smallest id is canonical
    assert v[6]["dup_of"] == 5 and v[7]["dup_of"] == 5


def test_replay_idempotent(spark, tmp_path):
    idx = str(tmp_path / "minhash_index")
    inc = _docs(spark, [(1, TEXT_A), (2, TEXT_B)])
    update_index(inc, idx, run_id="r1")
    n1 = spark.read.parquet(idx).count()
    update_index(inc, idx, run_id="r1")      # crashed-run replay
    assert spark.read.parquet(idx).count() == n1 == 2
    # replaying against one's own signatures must not self-flag:
    # doc 1 is IN the index now, but other_id != new_id excludes it
    v = {r["doc_id"]: r for r in
         update_index(inc, idx, run_id="r1").collect()}
    # both docs match their own indexed signatures exactly... except
    # self-pairs are excluded; they do match EACH OTHER only if texts
    # agree, which they don't:
    assert not v[2]["is_duplicate"]


def test_increment_buckets_are_broadcast(spark):
    """The scale contract: the index-side banded table is filtered by
    a BROADCAST of the increment's bucket keys."""
    inc = _docs(spark, [(1, TEXT_A)])
    from neleval_spark.functions.textops import minhash_signatures
    idx_sig = minhash_signatures(
        _docs(spark, [(100 + i, TEXT_B + str(i)) for i in range(20)]))
    plan = (check_increment(inc, idx_sig)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastExchange" in plan


def test_hot_bucket_cap_is_two_phase(spark):
    """PLANS claim: the hot-bucket cap never sorts a whole bucket in
    one task — phase 1 windows over (band, bucket, _sub) BEFORE any
    (band, bucket) window, and the composition still returns the
    smallest verified candidate (identical to a single-phase cap)."""
    import re

    from neleval_spark.functions.textops import minhash_signatures

    # a boilerplate bucket: many index docs with IDENTICAL text all
    # land in the same buckets; cap is far below the bucket size
    inc = _docs(spark, [(1, TEXT_A)])
    # shingle=3 matches check_increment's default signature space
    idx_sig = minhash_signatures(
        _docs(spark, [(100 + i, TEXT_A) for i in range(40)]),
        shingle=3)
    out = check_increment(inc, idx_sig, max_candidates=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every window listing (band, bucket) directly must be preceded
    # in its subtree by the _sub partial window (root prints first,
    # so the _sub window must appear AFTER the plain one but exist)
    assert "_sub" in plan, "two-phase sub-bucket column missing"
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    bucket_specs = [s for s in specs
                    if "band" in s and "bucket" in s]
    assert any("_sub" in s for s in bucket_specs), bucket_specs
    # composition == single-phase semantics: smallest index id wins
    v = {r["doc_id"]: r for r in out.collect()}
    assert v[1]["is_duplicate"] and v[1]["dup_of"] == 100


def test_stream_dedup_within_watermark(spark, tmp_path):
    from neleval_spark.streaming import stream_pages
    from neleval_spark.streaming.dedup import stream_dedup
    from neleval_spark.streaming.ingest import PAGES_SCHEMA

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def page(url, minutes, text):
        return (url, t0 + dt.timedelta(minutes=minutes),
                b"<p>x</p>", text, "en")

    pages_dir = str(tmp_path / "pages")
    spark.createDataFrame(
        [page("u1", 0, "alpha"), page("u2", 1, "beta")],
        PAGES_SCHEMA).coalesce(1).write.mode("append").parquet(pages_dir)
    spark.createDataFrame(
        [page("u3", 2, "alpha"),    # dup of u1 within watermark
         page("u4", 3, "gamma")],
        PAGES_SCHEMA).coalesce(1).write.mode("append").parquet(pages_dir)

    q = (stream_dedup(
            stream_pages(spark, pages_dir, max_files_per_trigger=1),
            watermark="30 minutes")
         .writeStream.format("memory").queryName("deduped")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    urls = {r["url"] for r in
            spark.sql("SELECT url FROM deduped").collect()}
    assert urls == {"u1", "u2", "u4"}


def test_simhash_column_equals_dataframe_simhash(spark):
    from neleval_spark.functions.textops import simhash, simhash_column
    rows = [(i, f"doc {i} about spark shuffles joins partitions "
                f"topic{i % 7} filler word soup {i * 17 % 5}")
            for i in range(40)] + [(99, "")]
    d = _docs(spark, rows)
    batch = {r["doc_id"]: r["simhash"] for r in simhash(d).collect()}
    inrow = {r["doc_id"]: r["sh"] for r in
             d.select("doc_id",
                      simhash_column(F.col("text")).alias("sh"))
             .collect()}
    # DataFrame simhash has no row for the token-less doc; in-row
    # yields the empty-vote value (all bits 0) for it
    assert inrow.pop(99) == 0
    assert batch == inrow


def test_stream_dedup_simhash_near(spark, tmp_path):
    import datetime as dt2
    from neleval_spark.functions.textops import simhash_column
    from neleval_spark.streaming import stream_pages
    from neleval_spark.streaming.dedup import stream_dedup
    from neleval_spark.streaming.ingest import PAGES_SCHEMA

    base = ("breaking news entity linking improves downstream "
            "retrieval quality across large web corpora today")
    # mirror-fetch variant: same tokens, different case / whitespace /
    # punctuation -> identical token multiset -> identical simhash
    near = base.upper().replace(" ", "  ").replace("news", "News,")
    other = "completely unrelated text about cooking pasta sauces"
    # precondition: the near pair shares the 16-bit bucket, the
    # unrelated doc doesn't
    sh = {r["t"]: r["s"] for r in spark.createDataFrame(
        [(base,), (near,), (other,)], "t string").select(
        "t", simhash_column(F.col("t")).alias("s")).collect()}
    assert sh[base] == sh[near] != sh[other]

    t0 = dt.datetime(2026, 1, 1)

    def page(url, minutes, text):
        return (url, t0 + dt2.timedelta(minutes=minutes),
                b"<p>x</p>", text, "en")

    pages_dir = str(tmp_path / "pages")
    spark.createDataFrame(
        [page("u1", 0, base), page("u2", 1, other)],
        PAGES_SCHEMA).coalesce(1).write.mode("append").parquet(pages_dir)
    spark.createDataFrame(
        [page("u3", 2, near)], PAGES_SCHEMA
    ).coalesce(1).write.mode("append").parquet(pages_dir)

    q = (stream_dedup(
            stream_pages(spark, pages_dir, max_files_per_trigger=1),
            mode="simhash")
         .writeStream.format("memory").queryName("near_dd")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt2"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    urls = {r["url"] for r in
            spark.sql("SELECT url FROM near_dd").collect()}
    assert urls == {"u1", "u2"}        # u3 is a near-dup of u1
