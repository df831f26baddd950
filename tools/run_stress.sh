#!/bin/bash
# Driver-runnable stress recipe (r16 verdict task 8): reproduce the
# builder's at-scale evidence with the driver's own bench contract.
#
#   tools/run_stress.sh [REPS] [SUBSET]
#
# Builds a REPS× verbatim-replica expansion of sf0.1 under /tmp/stressN
# (reusing it if already built), then runs graft.Bench against it with
# the standard env contract. REPS=10 fits a ~10-minute budget and makes
# every replica-collapse win visible (the pair family, tx_contamination,
# tx_boilerplate, dd_incremental engage their at-scale paths at 10×);
# REPS=100 is the full stress corpus (~35 min suite).
#
# Examples:
#   tools/run_stress.sh 10
#   tools/run_stress.sh 100 dd_substring,dd_simhash,tx_contamination
set -euo pipefail
REPS="${1:-10}"
SUBSET="${2:-}"
SRC="${SPARK_GRAFT_SRC_SF:-/root/testdata/sf0.1}"
DIR="/tmp/stress${REPS}"
if [ ! -f "$DIR/documents.parquet" ] && [ ! -d "$DIR/documents.parquet" ]; then
  python3 "$(dirname "$0")/make_stress.py" "$SRC" "$DIR" "$REPS"
fi
env SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-48g}" \
  SPARK_GRAFT_SF_DIR="$DIR" \
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  SPARK_GRAFT_RUNS="${SPARK_GRAFT_RUNS:-2}" \
  SPARK_GRAFT_MAX_CENTROIDS="${SPARK_GRAFT_MAX_CENTROIDS:-1024}" \
  ${SUBSET:+SPARK_GRAFT_ONLY="$SUBSET"} \
  SPARK_GRAFT_BENCH_OUT="${SPARK_GRAFT_BENCH_OUT:-BENCH_STRESS${REPS}_LATEST.json}" \
  sbt -batch "runMain graft.Bench"
