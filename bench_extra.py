#!/usr/bin/env python
"""Extra benchmarks for optimization work (bench.py is FROZEN for
measurement; this file holds the guide-§1 instrumentation: per-query
isolation, noop-sink timing, .explain("formatted") capture, job
labels).  Numbers from here are cited in OPTIMIZATION_r06.md; the
driver's official timing still comes from bench.py.

Usage:
  python bench_extra.py --queries strong_typed_all_match,b_cubed \
      [--reps 3] [--noop] [--explain-dir plans/r06 --suffix _before] \
      [--sf-dir /root/testdata/sf1.0] [--mimic-bench]

--mimic-bench times df.count() exactly like bench.py; --noop uses the
noop sink (computes every column).  Each rep rebuilds the DataFrame so
no shuffle map outputs are reused across reps (fresh lineage).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

HEADLINE = [
    "strong_typed_all_match", "b_cubed", "mention_ceaf",
    "overlap_pairs", "is_first", "top_candidate", "lineitem_pricing",
    "rank_systems", "dedup_exact", "token_stats", "cosine_topk",
    "sessionize",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=",".join(HEADLINE))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf1.0"))
    ap.add_argument("--no-warm-counts", action="store_true",
                    help="skip bench.py's pre-loop events/docs counts")
    args = ap.parse_args()

    import bench

    os.environ.setdefault("SPARK_GRAFT_SF_DIR", args.sf_dir)
    spark = bench._spark()
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = [q for q in args.queries.split(",") if q]

    if not args.no_warm_counts:
        # mirror bench.py's pre-loop counts (they warm the scans)
        spark.read.parquet(f"{args.sf_dir}/events.parquet").count()
        spark.read.parquet(f"{args.sf_dir}/documents.parquet").count()

    if args.explain_dir:
        os.makedirs(args.explain_dir, exist_ok=True)

    out: dict = {"sf_dir": args.sf_dir, "queries": {}}
    for name in names:
        if args.explain_dir:
            df = qs[name](spark, args.sf_dir)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(
                    args.explain_dir,
                    f"{name}{args.suffix}.txt"), "w") as f:
                f.write(plan)
        walls = []
        for rep in range(args.reps):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            walls.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        if not walls:
            continue
        walls_sorted = sorted(walls)
        out["queries"][name] = {
            "best": walls_sorted[0],
            "median": walls_sorted[len(walls_sorted) // 2],
            "all": walls,
        }
        print(f"{name}: best={walls_sorted[0]} all={walls}",
              file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
