#!/usr/bin/env bash
# North-rule run shape with SEPARATE EXECUTOR PROCESSES: the flagship
# pipeline at 1 executor x 4 cores vs 4 executors x 4 cores, each arm a
# real local-cluster of forked executor JVMs (Spark standalone machinery),
# measured under the same steal-gated pair protocol as graft.Bench.
# The driver itself runs tiny work; executors fetch the app jar via
# spark.jars (set automatically by spark-submit).
#
#   --smoke   run graft.tools.ClusterSmoke instead: cross-process
#             correctness (gate queries bit-identical on local[4] vs
#             local-cluster[1..2,2]) + jar-shipping/restart preconditions.
set -euo pipefail
cd "$(dirname "$0")/.."
CLASS=graft.ClusterBench
if [[ "${1:-}" == "--smoke" ]]; then CLASS=graft.tools.ClusterSmoke; fi
sbt -batch package >/dev/null
exec /opt/spark/bin/spark-submit \
  --master 'local[2]' \
  --driver-memory "${SPARK_DRIVER_MEM:-8g}" \
  --conf spark.ui.enabled=false \
  --class "$CLASS" \
  target/scala-2.13/diagonalb6spark_2.13-0.1.0.jar
