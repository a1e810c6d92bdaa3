"""One-off scale probe for fuzzy entity resolution (functions/er.py):
er_match + er_resolve over N synthetic KB names (word-combination
names, 40% perturbed with 1-2 random character edits, plus a block of
exact duplicates under different ids).  Reports wall time, candidate
volume vs the naive all-pairs count, the largest block size actually
produced (the prefix filter's skew claim), and cluster stats.
Evidence for the PLANS.md "Fuzzy entity resolution" scale note.
Usage:
    python scripts/run_er_probe.py [n_names]
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
from neleval_spark.functions.er import er_candidates, er_match, er_resolve

n_names = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
q = int(sys.argv[2]) if len(sys.argv) > 2 else 3

spark = get_spark(app_name="probe_er", master="local[32]",
                  shuffle_partitions=64, driver_memory="24g")

# synthetic KB names: 3 words from a 60-word vocabulary (~216k
# combos, so exact collisions exist by construction), 40% of rows
# additionally perturbed by 1-2 deterministic character edits
words = ("alpha beta gamma delta omega acme global united national "
         "first prime north south east west central pacific atlantic "
         "royal grand union trust corp group holdings partners labs "
         "systems dynamics logistics industries foods motors energy "
         "media digital analytics capital ventures solutions works "
         "brands metals textiles pharma optics marine aero rail "
         "civic urban rural summit apex zenith nova terra vista "
         "quartz").split()
V = len(words)
w = F.lit(words)
i = F.col("id")


def pick(seed):
    """word + 2-digit suffix: ~5,900 distinct tokens per position, so
    names are mostly unique (the realistic KB shape) while exact and
    near collisions still occur by the birthday bound."""
    word = F.element_at(
        w, (F.pmod(F.xxhash64(i, F.lit(seed)), F.lit(V)) + 1)
        .cast("int"))
    return F.concat(word, F.pmod(F.xxhash64(i, F.lit(seed + 100)),
                                 F.lit(100)).cast("string"))


base = (spark.range(n_names).repartition(64)
        .select(i, F.concat_ws(" ", pick(1), pick(2), pick(3))
                .alias("name")))
# deterministic edit: drop the (id mod len)-th char; second edit for
# half of the perturbed rows: substitute first char with 'x'
perturbed = (base.where(i % 5 < 2)
             .select(
                 F.concat(F.lit("v:"), i.cast("string")).alias("id"),
                 F.when(
                     i % 2 == 0,
                     F.expr("concat(substring(name, 1, cast(id % 12 as int) + 1),"
                            " substring(name, cast(id % 12 as int) + 3))"))
                 .otherwise(
                     F.expr("concat('x', substring(name, 2))"))
                 .alias("name")))
names = (base.select(F.concat(F.lit("b:"), i.cast("string"))
                     .alias("id"), "name")
         .unionByName(perturbed))
names.write.mode("overwrite").parquet("/tmp/er_probe_names")
names = spark.read.parquet("/tmp/er_probe_names")
n = names.count()
print(f"records: {n:,} q={q} (naive pairs: {n * (n - 1) // 2:,.0f})")

t0 = time.perf_counter()
cand = er_candidates(names, q=q)
n_cand = cand.count()
t_cand = time.perf_counter() - t0
print(f"er_candidates: {n_cand:,} blocked pairs in {t_cand:.1f} s "
      f"({n_cand / (n * (n - 1) / 2) * 100:.4f}% of naive)")

t0 = time.perf_counter()
pairs = er_match(names, q=q)
n_pairs = pairs.count()
t_match = time.perf_counter() - t0
print(f"er_match: {n_pairs:,} verified pairs in {t_match:.1f} s "
      f"({n / t_match:,.0f} names/s end-to-end)")

t0 = time.perf_counter()
resolved = er_resolve(names, q=q)
stats = resolved.agg(
    F.countDistinct("canonical").alias("clusters"),
    F.max("cluster_size").alias("largest")).collect()[0]
t_res = time.perf_counter() - t0
print(f"er_resolve: {stats['clusters']:,} clusters "
      f"(largest {stats['largest']:,}) in {t_res:.1f} s")

spark.stop()
