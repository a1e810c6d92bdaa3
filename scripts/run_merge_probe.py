"""One-off scale probe: copy-on-write KG generation merge
(pipeline/snapshots.merge_commit) at millions of triples — wall,
triples/sec, and snapshot-layer overhead, evidencing the PLANS.md
copy-on-write trade note.

Shape under test: gen-1 bootstraps a BASE_N-triple KG; gen-2 merges a
DELTA_N-triple delta where half the delta re-observes existing
triples (the upsert side of the full-outer join) and half is novel.
The merge is ONE full-outer join on the KG primary key + a
full-table rewrite (copy-on-write), so the probe separates:

  * merge_commit wall for gen-1 (pure write + commit; no join), and
  * merge_commit wall for gen-2 (join + rewrite of BASE_N+DELTA_N/2
    rows) — the steady-state cost per generation.

Usage:
    python scripts/run_merge_probe.py [base_n] [delta_n]
"""
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

base_n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
delta_n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000

if os.path.isdir("/dev/shm"):
    os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR",
                          "/dev/shm/spark_local")
from pyspark.sql import functions as F

from neleval_spark import get_spark
from neleval_spark.pipeline.snapshots import (current_snapshot,
                                              merge_commit,
                                              read_snapshot)

spark = get_spark(app_name="probe_merge", master="local[32]",
                  shuffle_partitions=64, driver_memory="24g")
tmp = tempfile.mkdtemp(prefix="probemerge_")
out = os.path.join(tmp, "kg")


def kg_rows(lo, hi, gen):
    """Aggregated-KG rows keyed e{k}: near-unique primary key (the
    real KG's key distribution — no skew side by construction)."""
    i = F.col("id")
    return (spark.range(lo, hi).repartition(64).select(
        F.concat(F.lit("e"), i.cast("string")).alias("subj"),
        F.lit("cooccurs_with").alias("pred"),
        F.concat(F.lit("e"), (i + F.lit(1)).cast("string")).alias("obj"),
        (F.pmod(i, F.lit(7)) + F.lit(1)).cast("long").alias("n_pages"),
        F.lit(gen).alias("first_seen"),
        F.lit(gen).alias("last_seen")))


try:
    t0 = time.time()
    s1 = merge_commit(spark, out, kg_rows(0, base_n, 1), generation=1)
    t1 = time.time() - t0
    # delta: first half re-observes keys [0, delta_n/2), second half
    # is novel keys [base_n, base_n + delta_n/2)
    delta = kg_rows(0, delta_n // 2, 2).unionByName(
        kg_rows(base_n, base_n + delta_n // 2, 2))
    t0 = time.time()
    s2 = merge_commit(spark, out, delta, generation=2)
    t2 = time.time() - t0
    final = read_snapshot(spark, out)
    n_final = final.count()
    n_updated = final.where(
        (F.col("first_seen") == 1) & (F.col("last_seen") == 2)).count()
    cur = current_snapshot(out)
    print({
        "base_n": base_n, "delta_n": delta_n,
        "gen1_wall_s": round(t1, 1),
        "gen1_triples_per_s": round(base_n / t1),
        "gen2_wall_s": round(t2, 1),
        "gen2_rewritten_rows_per_s": round(n_final / t2),
        "final_rows": n_final, "updated_rows": n_updated,
        "snapshot_files": len(cur["added"]),
        "removed_from_parent": len(cur["removed"]),
    })
    assert n_final == base_n + delta_n // 2
    assert n_updated == delta_n // 2
finally:
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()
