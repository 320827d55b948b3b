#!/bin/bash
# Scaling-efficiency harness: per-level JVMs with GC threads pinned to the
# level's core count (fair N vs 4N comparison), median of REPS runs.
# Usage: tools/scaling.sh [nRows] [maxLen] [smallCores] [reps]
set -e
cd "$(dirname "$0")/.."
N=${1:-8000000}; L=${2:-128}; SMALL=${3:-8}; REPS=${4:-5}; BIG=$((SMALL*4))

sbt -batch "runMain graft.ScalingBench gen $N $L" 2>/dev/null | grep DATADIR
DATADIR=/tmp/graft-scaling-input-$N-$L

measure () {
  local cores=$1
  GRAFT_JAVA_OPTS="-XX:+UseParallelGC -XX:ParallelGCThreads=$cores" \
  SPARK_DRIVER_MEM=40g \
  sbt -batch "runMain graft.ScalingBench measure $cores $DATADIR $REPS" 2>/dev/null \
    | grep '"cores"'
}

SMALL_JSON=$(measure $SMALL)
BIG_JSON=$(measure $BIG)
echo "$SMALL_JSON"; echo "$BIG_JSON"

ROWS=$(echo "$SMALL_JSON" | sed 's/.*"rows":\([0-9]*\).*/\1/')
TS=$(echo "$SMALL_JSON" | sed 's/.*"wall_min":\([0-9.]*\).*/\1/')
TB=$(echo "$BIG_JSON" | sed 's/.*"wall_min":\([0-9.]*\).*/\1/')
CS=$(echo "$SMALL_JSON" | sed 's/.*"calib":\([0-9.]*\).*/\1/')
CB=$(echo "$BIG_JSON" | sed 's/.*"calib":\([0-9.]*\).*/\1/')
sbt -batch "runMain graft.ScalingBench report $ROWS $SMALL $TS $BIG $TB $CS $CB" 2>/dev/null | grep -E '\||efficiency'
