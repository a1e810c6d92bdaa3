#!/usr/bin/env bash
# Cluster deployment example (north_rule: spark-submit --py-files on a
# multi-executor cluster).  Packages the library, ships it to the
# executors, and runs the KG-construction pipeline over an input table
# of (url, warc_ts, html, text, lang).
#
# Usage: scripts/submit_pipeline.sh <pages_path> <out_dir> [master]
set -euo pipefail
PAGES=${1:?pages parquet/iceberg path}
OUT=${2:?output dir}
MASTER=${3:-yarn}

cd "$(dirname "$0")/.."
rm -f /tmp/neleval_spark.zip
(zip -qr /tmp/neleval_spark.zip neleval_spark)

spark-submit \
  --master "$MASTER" \
  --deploy-mode client \
  --py-files /tmp/neleval_spark.zip \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-2000}" \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  scripts/run_pipeline_job.py "$PAGES" "$OUT"
