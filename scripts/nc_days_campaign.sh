#!/bin/bash
# Multi-day BSSA processing campaign (VERDICT r2 item 3: >=10 days).
# Serial day loop on the single TPU tunnel, one eval JSON per day, skip
# days already done, pidfile maintained for bench.py's tunnel guard.
# Per-day crash resilience comes from nc_process's sweep retry + partial
# checkpoints; the loop itself re-runs any day without a JSON on restart.
#
#   scripts/nc_days_campaign.sh <run_dir> <n_grids> <half:0|1> <day>...
set -u
R=$(cd "$(dirname "$0")/.." && pwd)
RUN=${1:?run dir}; NG=${2:?n_grids}; HALF=${3:?half 0/1}; shift 3
PIDFILE=$R/projects/NC_EHZ/.tpu_stage.pid
HARG=""; [ "$HALF" = 1 ] && HARG="--half"

for day in "$@"; do
  out=$R/$RUN/eval_${day}_g${NG}.json
  if [ -s "$out" ]; then echo "[campaign] $day done, skip"; continue; fi
  echo "[campaign] $day start $(date -u +%H:%M:%S)"
  python -u "$R/scripts/nc_process.py" --run "$R/$RUN" --days "$day" \
    --thresh ${THRESHOLDS:-0.25 0.35} --n-grids "$NG" $HARG \
    --cache-sweep --save-catalog --json-out "$out" \
    > "$R/$RUN/process_${day}.log" 2>&1 &
  PID=$!
  echo $PID > "$PIDFILE"
  wait $PID; rc=$?
  [ "$(cat "$PIDFILE" 2>/dev/null)" = "$PID" ] && rm -f "$PIDFILE"
  if [ $rc -ne 0 ]; then
    echo "[campaign] $day FAILED rc=$rc (will retry once)"
    python -u "$R/scripts/nc_process.py" --run "$R/$RUN" --days "$day" \
      --thresh ${THRESHOLDS:-0.25 0.35} --n-grids "$NG" $HARG \
      --cache-sweep --save-catalog --json-out "$out" \
      >> "$R/$RUN/process_${day}.log" 2>&1 &
    PID=$!
    echo $PID > "$PIDFILE"
    wait $PID; rc=$?
    [ "$(cat "$PIDFILE" 2>/dev/null)" = "$PID" ] && rm -f "$PIDFILE"
  fi
  echo "[campaign] $day rc=$rc $(date -u +%H:%M:%S)"
done
echo "[campaign] all days attempted"
