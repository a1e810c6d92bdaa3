"""(subj, pred, obj) triple materialization with per-partition lineage
manifests and checkpoint-resume.

Triples emitted from linked+canonicalized mentions:

* ``(eid, mentioned_in, url)`` — one per distinct (url, eid);
* ``(eid_a, cooccurs_with, eid_b)`` — per distinct within-sentence
  entity pair, ordered a < b.

Physical layout: parquet partitioned by ``part_id =
pmod(xxhash64(url), n_buckets)`` (the Iceberg mapping would be
``bucket(n, url)`` as the partition transform; this environment has no
Iceberg runtime, so the layout + manifest are expressed directly).
Each completed partition gets a manifest row

    (part_id, n_rows, checksum, run_id)

and a resumed run anti-joins the manifest to skip completed partitions
— the bucket function is a pure function of the row, so work lost in a
crash is re-derived exactly.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def emit_triples(mentions: DataFrame, n_buckets: int = 64) -> DataFrame:
    """Mentions (url, sent_uid, eid) → triple rows with part_id."""
    m = mentions.select("url", "sent_uid", "eid").where(
        F.col("eid").isNotNull())

    mentioned_in = (
        m.select("url", "eid").distinct()
        .select(
            F.col("eid").alias("subj"),
            F.lit("mentioned_in").alias("pred"),
            F.col("url").alias("obj"),
            F.col("url"),
        )
    )

    a = m.alias("a")
    b = m.alias("b")
    cooccurs = (
        a.join(
            b,
            (F.col("a.url") == F.col("b.url"))
            & (F.col("a.sent_uid") == F.col("b.sent_uid"))
            & (F.col("a.eid") < F.col("b.eid")),
        )
        .select(
            F.col("a.eid").alias("subj"),
            F.lit("cooccurs_with").alias("pred"),
            F.col("b.eid").alias("obj"),
            F.col("a.url").alias("url"),
        )
        .distinct()
    )

    out = mentioned_in.unionByName(cooccurs)
    return out.withColumn(
        "part_id", F.pmod(F.xxhash64("url"), F.lit(n_buckets)))


def _manifest(triples: DataFrame, run_id: str) -> DataFrame:
    return (
        triples.groupBy("part_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(xxhash64(subj, pred, obj))").alias("checksum"),
        )
        .withColumn("run_id", F.lit(run_id))
    )


def write_triples(
    triples: DataFrame,
    out_dir: str,
    resume: bool = True,
    run_id: str | None = None,
) -> DataFrame:
    """Write triples partitioned by part_id; skip partitions already
    recorded in the manifest (checkpoint-resume). Returns the manifest
    DataFrame for the completed state."""
    spark = triples.sparkSession
    run_id = run_id or f"run-{int(time.time() * 1000)}"
    data_dir = os.path.join(out_dir, "triples")
    manifest_dir = os.path.join(out_dir, "manifest")

    done = None
    if resume and _exists(spark, manifest_dir):
        done = spark.read.parquet(manifest_dir).select("part_id").distinct()

    todo = triples
    if done is not None:
        todo = triples.join(F.broadcast(done), "part_id", "left_anti")

    if not todo.isEmpty():
        todo.write.mode("append").partitionBy("part_id").parquet(data_dir)
        new_manifest = _manifest(todo, run_id)
        new_manifest.write.mode("append").parquet(manifest_dir)

    return spark.read.parquet(manifest_dir)


def read_triples(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "triples"))


def _exists(spark: SparkSession, path: str) -> bool:
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf).exists(p)
