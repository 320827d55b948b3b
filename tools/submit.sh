#!/bin/bash
# spark-submit launcher for the packaged engine (the cluster path — the
# same jar submits unchanged to a multi-executor master; local[N] here).
#
# Usage: tools/submit.sh <mainClass> [masterN] [args...]
#   e.g. tools/submit.sh graft.tools.AuditCli 8 1000000 128
#        tools/submit.sh graft.tools.ValidateCli 8 table.parquet pack.yaml id
set -e
cd "$(dirname "$0")/.."
CLASS=${1:?main class required}; N=${2:-8}; shift 2 || true
JAR=target/scala-2.13/jsonvalidatorspark_2.13-0.1.0.jar
[ -f "$JAR" ] || sbt -batch package
exec /opt/spark/bin/spark-submit \
  --class "$CLASS" \
  --master "local[$N]" \
  --conf spark.sql.extensions=graft.GraftExtensions \
  --driver-memory "${SPARK_DRIVER_MEM:-8g}" \
  "$JAR" "$@"
