"""One-off scale probe: positional inverted index and ExactSubstr
window dedup over N synthetic documents — wall / docs/sec /
postings/sec for build_inverted_index, keyword_topk, and
dedup_substrings (adaptive-broadcast default).  Evidence for the
PLANS.md flat-postings and boilerplate-window scale notes (VERDICT r4
item 9).
Usage:
    python scripts/run_ir_dedup_probe.py [n_docs]
"""
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000

if os.path.isdir("/dev/shm"):
    os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR",
                          "/dev/shm/spark_local")
from pyspark.sql import functions as F

from neleval_spark import get_spark
from neleval_spark.functions.corpusops import dedup_substrings
from neleval_spark.functions.retrieval import (build_inverted_index,
                                               keyword_topk)

spark = get_spark(app_name="probe_ir_dedup", master="local[32]",
                  shuffle_partitions=64, driver_memory="24g")
tmp = tempfile.mkdtemp(prefix="probeir_")
try:
    # ~120 tokens/doc: a per-doc unique half + a SHARED boilerplate
    # half drawn from 40 templates (Zipf-hot windows + a stopword-ish
    # giant-posting vocabulary: w0..w499 recur corpus-wide)
    i = F.col("id")
    docs = (
        spark.range(n_docs).repartition(64)
        .select(
            i.alias("doc_id"),
            F.concat(
                F.array_join(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(59)),
                        lambda k: F.concat(
                            F.lit("w"),
                            F.pmod(i * F.lit(61) + k * F.lit(131),
                                   F.lit(500)).cast("string"))),
                    " "),
                F.lit(" "),
                # boilerplate: 60 tokens fully determined by template
                F.array_join(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(59)),
                        lambda k: F.concat(
                            F.lit("tpl"),
                            F.pmod(i, F.lit(40)).cast("string"),
                            F.lit("_"), k.cast("string"))),
                    " ")).alias("text")))
    docs.write.mode("overwrite").parquet(tmp)
    docs = spark.read.parquet(tmp)
    docs.count()

    t0 = time.perf_counter()
    idx = build_inverted_index(docs, positional=True)
    n_postings = idx.count()
    t_idx = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_kw = keyword_topk(build_inverted_index(docs, positional=False),
                        k=5).count()
    t_kw = time.perf_counter() - t0

    t0 = time.perf_counter()
    dd = dedup_substrings(docs, k=20, min_docs=2)
    agg = dd.agg(F.count("*").alias("n"),
                 F.sum("n_removed").alias("removed")).collect()[0]
    t_dd = time.perf_counter() - t0

    print({
        "n_docs": n_docs,
        "inverted_index": {"seconds": round(t_idx, 2),
                           "postings": n_postings,
                           "docs_per_sec": round(n_docs / t_idx)},
        "keyword_topk": {"seconds": round(t_kw, 2), "rows": n_kw,
                         "docs_per_sec": round(n_docs / t_kw)},
        "dedup_substrings": {"seconds": round(t_dd, 2),
                             "docs": agg["n"],
                             "tokens_removed": int(agg["removed"]),
                             "docs_per_sec": round(n_docs / t_dd)},
    })
finally:
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()
