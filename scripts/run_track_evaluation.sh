#!/usr/bin/env bash
# Whole-track evaluation (analogue of the reference's
# scripts/run_tac14_evaluation.sh pipeline). The reference fans out
# per-system with `xargs -P N` because each process is
# single-threaded; here ONE Spark session evaluates every system with
# internal parallelism — no NUM_JOBS argument needed.
#
# Usage: scripts/run_track_evaluation.sh GOLD_XML GOLD_TAB SYSTEMS_DIR OUT_DIR [-x EXCLUDED_SPANS]
set -euo pipefail
GOLD_XML=${1:?gold queries xml}
GOLD_TAB=${2:?gold link tab}
SYSDIR=${3:?dir of <system>.tab/<system>.xml pairs}
OUTDIR=${4:?output dir}
shift 4

cd "$(dirname "$0")/.."
exec python -m neleval_spark track-eval \
  "$GOLD_XML" "$GOLD_TAB" "$SYSDIR" -o "$OUTDIR" "$@"
