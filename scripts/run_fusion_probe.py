"""One-off scale probe for the knowledge-fusion family: fuse_facts
over ~2M witness claims (100k functional keys x ~20 sources, one
hub fact with 300k witnessing sources to exercise the skew-join
shape, 25% corrupted claims) and align_predicates over a 4-predicate
~2M-triple table. Evidence for the PLANS.md kg_fuse/kg_align notes.
Usage:
    python scripts/run_fusion_probe.py [n_claims]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
if os.path.isdir("/dev/shm"):
    os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR",
                          "/dev/shm/spark_local")
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in (os.environ.get("PYTHONPATH"), REPO) if p)

from pyspark.sql import functions as F

from neleval_spark import get_spark
from neleval_spark.pipeline.fusion import align_predicates, fuse_facts

n_claims = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000

spark = get_spark(app_name="probe_fusion", master="local[32]",
                  shuffle_partitions=64, driver_memory="24g")
i = F.col("id")

# --- fuse_facts: 100k keys, ~20 sources each, one hub fact claimed
# by 300k distinct sources, every 4th claim corrupted
base = spark.range(n_claims).repartition(64)
claims = base.select(
    F.concat(F.lit("h"), (i % 50_000).cast("string")).alias("source"),
    F.when(i < 300_000, F.lit("HUB"))
    .otherwise(F.concat(F.lit("E"), (i % 100_000).cast("string")))
    .alias("subj"),
    F.lit("born_in").alias("pred"),
    F.when(i < 300_000, F.lit("hubcity"))
    .when(i % 4 == 0, F.concat(F.lit("W"), (i % 3).cast("string")))
    .otherwise(F.concat(F.lit("C"), (i % 100_000).cast("string")))
    .alias("obj"))
t0 = time.perf_counter()
n_facts = fuse_facts(claims, n_iter=2).count()
t_fuse = time.perf_counter() - t0

# --- align_predicates: 4 predicates over a SHARED pair universe
# (pred keyed on i // 200k, pair on i % 200k, so every one of the
# 200k distinct pairs is asserted under all 4 predicates across the
# 2M rows — the self-join's per-pair fan-out is the documented
# schema-vocabulary bound, and all 6 predicate pairs align)
tr = base.select(
    F.concat(F.lit("p"), ((i / 200_000).cast("long") % 4)
             .cast("string")).alias("pred"),
    F.concat(F.lit("E"), (i % 200_000).cast("string")).alias("subj"),
    F.concat(F.lit("C"), (i % 200_000).cast("string")).alias("obj"))
t0 = time.perf_counter()
n_pairs = align_predicates(tr, min_support=2,
                           min_overlap_pct=10).count()
t_align = time.perf_counter() - t0

print({"n_claims": n_claims, "fuse_facts_s": round(t_fuse, 1),
       "n_facts": n_facts, "align_s": round(t_align, 1),
       "n_pred_pairs": n_pairs})
spark.stop()
