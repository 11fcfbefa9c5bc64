#!/usr/bin/env bash
# North-rule run shape: the benchmark via spark-submit (not sbt).
# Bench opens its own local[N] / local[4N] sessions internally, so one
# submission measures both parallelism levels on identical input.
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch package >/dev/null
exec /opt/spark/bin/spark-submit \
  --master 'local[32]' \
  --driver-memory "${SPARK_DRIVER_MEM:-24g}" \
  --conf spark.ui.enabled=false \
  --class graft.Bench \
  target/scala-2.13/diagonalb6spark_2.13-0.1.0.jar
