#!/bin/bash
# Scaling-efficiency harness (north rule: the same job via spark-submit at
# two parallelism levels). Per-level JVMs with GC threads pinned to the
# level's core count (fair N vs 4N comparison), min of REPS runs.
# Usage: tools/scaling.sh [nRows] [maxLen] [smallCores] [reps]
set -e
cd "$(dirname "$0")/.."
N=${1:-8000000}; L=${2:-128}; SMALL=${3:-8}; REPS=${4:-5}; BIG=$((SMALL*4))
JAR=target/scala-2.13/jsonvalidatorspark_2.13-0.1.0.jar
[ -f "$JAR" ] || sbt -batch package

submit () { # cores, args...
  local cores=$1; shift
  /opt/spark/bin/spark-submit \
    --class graft.ScalingBench --master "local[$cores]" \
    --driver-memory 40g \
    --driver-java-options "-XX:+UseParallelGC -XX:ParallelGCThreads=$cores" \
    "$JAR" "$@" 2>/dev/null
}

submit 32 gen "$N" "$L" | grep DATADIR
DATADIR=/tmp/graft-scaling-input-$N-$L

SMALL_JSON=$(submit $SMALL measure $SMALL "$DATADIR" "$REPS" | grep '"cores"')
BIG_JSON=$(submit $BIG measure $BIG "$DATADIR" "$REPS" | grep '"cores"')
echo "$SMALL_JSON"; echo "$BIG_JSON"

ROWS=$(echo "$SMALL_JSON" | sed 's/.*"rows":\([0-9]*\).*/\1/')
TS=$(echo "$SMALL_JSON" | sed 's/.*"wall_min":\([0-9.]*\).*/\1/')
TB=$(echo "$BIG_JSON" | sed 's/.*"wall_min":\([0-9.]*\).*/\1/')
CS=$(echo "$SMALL_JSON" | sed 's/.*"calib":\([0-9.]*\).*/\1/')
CB=$(echo "$BIG_JSON" | sed 's/.*"calib":\([0-9.]*\).*/\1/')
submit 8 report "$ROWS" "$SMALL" "$TS" "$BIG" "$TB" "$CS" "$CB" | grep -E '\||efficiency'
