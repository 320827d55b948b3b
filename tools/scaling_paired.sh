#!/bin/bash
# Paired-interleaved scaling harness: alternates single-rep small/big
# measurements so each efficiency ratio compares two runs taken minutes
# apart under the SAME machine state, instead of two 5-run phases that can
# straddle a neighbor-load change (tools/scaling.sh's one weakness on this
# shared VM). Reports the per-pair efficiencies and their median, raw and
# normalized to the per-pair hardware-ceiling calibration.
# Usage: tools/scaling_paired.sh [nRows] [maxLen] [smallCores] [pairs]
set -e
cd "$(dirname "$0")/.."
N=${1:-24000000}; L=${2:-64}; SMALL=${3:-8}; PAIRS=${4:-5}; BIG=$((SMALL*4))
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

submit 32 gen "$N" "$L" | grep DATADIR || true
DATADIR=/tmp/graft-scaling-input-$N-$L

RATIO=$((BIG / SMALL))
EFFS=(); NORMS=()
for p in $(seq "$PAIRS"); do
  SJ=$(submit "$SMALL" measure "$SMALL" "$DATADIR" 1 | grep '"cores"')
  BJ=$(submit "$BIG"   measure "$BIG"   "$DATADIR" 1 | grep '"cores"')
  TS=$(echo "$SJ" | sed 's/.*"wall_min":\([0-9.]*\).*/\1/')
  TB=$(echo "$BJ" | sed 's/.*"wall_min":\([0-9.]*\).*/\1/')
  CS=$(echo "$SJ" | sed 's/.*"calib":\([0-9.]*\).*/\1/')
  CB=$(echo "$BJ" | sed 's/.*"calib":\([0-9.]*\).*/\1/')
  EFF=$(python3 -c "print(f'{$TS/($RATIO*$TB):.3f}')")
  CEIL=$(python3 -c "print(f'{$CS/($RATIO*$CB):.3f}')")
  NORM=$(python3 -c "print(f'{($TS/($RATIO*$TB))/($CS/($RATIO*$CB)):.3f}')")
  echo "[pair $p] small=${TS}s big=${TB}s eff=$EFF ceiling=$CEIL normalized=$NORM"
  EFFS+=("$EFF"); NORMS+=("$NORM")
done

python3 - "$N" "${EFFS[@]}" -- "${NORMS[@]}" <<'EOF'
import sys
argv = sys.argv[1:]
rows = argv[0]
sep = argv.index('--')
effs = sorted(float(x) for x in argv[1:sep])
norms = sorted(float(x) for x in argv[sep+1:])
med = lambda xs: xs[len(xs)//2]
print(f'{{"metric":"scaling_efficiency_paired","value":{med(effs):.3f},'
      f'"normalized_median":{med(norms):.3f},"rows":{rows},'
      f'"eff_all":{effs},"norm_all":{norms}}}')
EOF
