#!/usr/bin/env bash
# Filtered-subset re-evaluation over a track-eval output directory
# (analogue of the reference's scripts/run_tac14_filtered.sh +
# run_filtrate.sh + run_tac15_filtered.sh/run_tac16_filtered.sh and
# split-by-netype.sh). The reference egreps temp copies of every
# combined.tsv and re-spawns an evaluator per (system, subset) with
# xargs -P; here ONE Spark session filters each subset with a JVM
# rlike on the text scan and evaluates everything internally.
#
# Usage: scripts/run_filtered_track_evaluation.sh OUT_DIR \
#          [--filter NAME:::REGEX ...] [--netype-split]
# Default filter set: the reference's TAC14 type/genre/combined list.
set -euo pipefail
OUTDIR=${1:?track-eval output dir of *.combined.tsv}
shift || true

cd "$(dirname "$0")/.."
exec python -m neleval_spark filtered-track-eval "$OUTDIR" "$@"
