"""Snapshot metadata layer over the triple sink (pipeline/snapshots).

Exercises the Iceberg-style guarantees the module claims: snapshot
isolation (a reader pinned to snapshot N never sees a later append),
time travel by timestamp, replace commits (compaction), retention
(expire + orphan removal), crashed-writer invisibility, and the
optimistic-concurrency retry.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from neleval_spark.pipeline.snapshots import (
    commit_snapshot, current_snapshot, expire_snapshots,
    read_snapshot, remove_orphan_files, rollback, snapshots)
from neleval_spark.pipeline.triples import write_triples


def _mk_triples(spark, lo, hi, part_mod=4):
    return (spark.range(lo, hi)
            .select(F.col("id").alias("subj"),
                    F.lit("p").alias("pred"),
                    F.concat(F.lit("o"), F.col("id")).alias("obj"),
                    (F.col("id") % part_mod).cast("int").alias("part_id")))


@pytest.fixture()
def sink(spark, tmp_path):
    out = str(tmp_path / "sink")
    write_triples(_mk_triples(spark, 0, 40), out, resume=False,
                  run_id="r1")
    s1 = commit_snapshot(out, run_id="r1", timestamp=100.0)
    write_triples(_mk_triples(spark, 40, 100), out, resume=False,
                  run_id="r2")
    s2 = commit_snapshot(out, run_id="r2", timestamp=200.0)
    return out, s1, s2


def test_commit_and_current(sink):
    out, s1, s2 = sink
    assert (s1["seq"], s1["parent"]) == (1, None)
    assert (s2["seq"], s2["parent"]) == (2, 1)
    assert s2["added"] and not s2["removed"]
    # second commit's added files are the delta, not the full listing
    assert not set(s1["added"]) & set(s2["added"])
    assert current_snapshot(out)["seq"] == 2
    assert [s["seq"] for s in snapshots(out)] == [1, 2]


def test_snapshot_isolation_and_time_travel(spark, sink):
    out, s1, s2 = sink
    # pinned reader: snapshot 1 sees only the first batch even though
    # the live directory now holds both
    assert read_snapshot(spark, out, snapshot_id=1).count() == 40
    assert read_snapshot(spark, out).count() == 100
    # time travel by timestamp
    assert read_snapshot(spark, out, as_of_ts=150.0).count() == 40
    assert read_snapshot(spark, out, as_of_ts=200.0).count() == 100
    with pytest.raises(ValueError, match="no snapshot at or before"):
        read_snapshot(spark, out, as_of_ts=50.0)
    with pytest.raises(ValueError, match="not both"):
        read_snapshot(spark, out, snapshot_id=1, as_of_ts=150.0)
    # partition columns survive the explicit-file scan (basePath)
    assert "part_id" in read_snapshot(spark, out, snapshot_id=1).columns


def test_uncommitted_write_is_invisible(spark, sink):
    """Iceberg orphan semantics: a write whose commit never ran (a
    crashed writer) is invisible to every snapshot reader."""
    out, _s1, _s2 = sink
    write_triples(_mk_triples(spark, 100, 130), out, resume=False,
                  run_id="crashed")  # no commit_snapshot
    assert read_snapshot(spark, out).count() == 100
    # the next proper commit adopts the stray files (they are live
    # data not referenced by the parent chain)
    s3 = commit_snapshot(out, run_id="r3", timestamp=300.0)
    assert read_snapshot(spark, out, snapshot_id=s3["seq"]).count() == 130


def test_replace_commit_compaction(spark, sink):
    """A rewrite (compaction) commit: the new listing REPLACES the
    parent set; the pre-compact snapshot still resolves until expired."""
    out, _s1, _s2 = sink
    df = read_snapshot(spark, out)
    rewritten = df.repartition(1)
    data = os.path.join(out, "triples")
    # rewrite in place the way compact_triples stages+swaps: here we
    # just overwrite the data dir with one file per partition value
    rewritten.write.mode("overwrite").partitionBy("part_id") \
        .parquet(data)
    s3 = commit_snapshot(out, operation="replace", run_id="compact",
                         timestamp=300.0)
    assert s3["operation"] == "replace"
    assert sorted(s3["removed"]) == sorted(
        set(_files_of(out, 1)) | set(_files_of(out, 2)))
    assert read_snapshot(spark, out).count() == 100
    # chain resolution stops at the replace: only its own files
    assert set(_resolve(out, 3)) == set(s3["added"])


def _files_of(out, seq):
    with open(os.path.join(out, "metadata",
                           f"snapshot-{seq}.json")) as f:
        return json.load(f)["added"]


def _resolve(out, seq):
    from neleval_spark.pipeline.snapshots import _resolve_files
    return _resolve_files(out, seq)


def test_expire_and_orphans(spark, sink):
    out, _s1, _s2 = sink
    expired = expire_snapshots(out, keep_last=1)
    assert expired == [1]
    # survivor is re-rooted with its cumulative file set
    live = snapshots(out)
    assert len(live) == 1 and live[0]["parent"] is None
    assert read_snapshot(spark, out).count() == 100
    with pytest.raises(ValueError, match="expired or unknown"):
        read_snapshot(spark, out, snapshot_id=1)
    # orphan removal: nothing is orphaned yet (snapshot 2 is
    # cumulative), so zero deletions even with no grace period
    assert remove_orphan_files(out, older_than_s=0) == []


def test_orphan_removal_after_replace(spark, sink):
    """Iceberg-shaped compaction: the rewriter writes NEW files beside
    the old ones and the replace commit re-points via an explicit
    `added` list — old files stay on disk, unreferenced, until
    expire + orphan cleanup."""
    out, _s1, _s2 = sink
    from neleval_spark.pipeline.snapshots import _list_data_files
    before = set(_list_data_files(out))
    write_triples(read_snapshot(spark, out).repartition(1), out,
                  resume=False, run_id="compact")
    new = sorted(set(_list_data_files(out)) - before)
    assert new
    s3 = commit_snapshot(out, operation="replace", added=new,
                         timestamp=300.0)
    # removed = the parent chain's files this rewrite superseded
    assert sorted(s3["removed"]) == sorted(
        set(_files_of(out, 1)) | set(_files_of(out, 2)))
    assert read_snapshot(spark, out).count() == 100
    expire_snapshots(out, keep_last=1)
    # pre-compact files are now unreferenced; grace period respected
    assert remove_orphan_files(out, older_than_s=10**6) == []
    deleted = remove_orphan_files(out, older_than_s=0)
    assert deleted
    assert read_snapshot(spark, out).count() == 100
    # every remaining data file is referenced
    assert remove_orphan_files(out, older_than_s=0) == []


def test_optimistic_concurrency_retry(spark, sink):
    """A contended sequence number is retried, and a slow loser never
    moves the pointer backwards over a winner's commit."""
    out, _s1, _s2 = sink
    # another writer already took seq 3 AND seq 4's pointer position
    with open(os.path.join(out, "metadata", "snapshot-3.json"),
              "x") as f:
        json.dump({"seq": 3, "parent": 2, "run_id": "other",
                   "operation": "append", "ts": 250.0,
                   "added": [], "removed": []}, f)
    s = commit_snapshot(out, run_id="retry", timestamp=300.0)
    assert s["seq"] == 4 and s["parent"] == 2
    assert current_snapshot(out)["seq"] == 4


def test_rollback(spark, sink):
    """Rollback restores an earlier table state; the abandoned
    snapshot becomes divergent history that expire + orphan cleanup
    reclaims, and later commits never re-adopt its files."""
    out, _s1, _s2 = sink
    assert rollback(out, 1)["seq"] == 1
    assert current_snapshot(out)["seq"] == 1
    assert read_snapshot(spark, out).count() == 40
    # snapshot 2 stays on disk as divergent history
    assert [s["seq"] for s in snapshots(out)] == [1, 2]
    # next commit chains from the restored snapshot; the rolled-back
    # files are still referenced by live metadata, so the auto-added
    # default does not adopt them
    s3 = commit_snapshot(out, run_id="r3", timestamp=300.0)
    assert (s3["parent"], s3["added"]) == (1, [])
    assert read_snapshot(spark, out).count() == 40
    # expiring the divergent branch frees its files for orphan cleanup
    expire_snapshots(out, keep_last=1)
    assert remove_orphan_files(out, older_than_s=0)
    assert read_snapshot(spark, out).count() == 40
    with pytest.raises(ValueError, match="expired or unknown"):
        rollback(out, 99)


def test_remote_uri_refused(tmp_path):
    with pytest.raises(ValueError, match="POSIX"):
        commit_snapshot("s3://bucket/table")
