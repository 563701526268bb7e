#!/bin/bash
# Round-5 post-rescore TPU queue (serial on the one tunnel):
#   1. magnitude end-to-end on two 500-random-day-test days (amplitudes
#      exist there; VERDICT r4 next #6),
#   2. corrections reprocessing of a held-out day (next #5),
#   3. extended 100-days campaign days (next #3) until the session ends.
set -u
R=$(cd "$(dirname "$0")/.." && pwd)
RUN=$R/projects/NC_EHZ/run6
PIDFILE=$R/projects/NC_EHZ/.tpu_stage.pid

run() {  # watchdogged stage: run "$@" with stall kill
  local log=$1; shift
  "$@" >> "$log" 2>&1 &
  local PID=$!
  echo $PID > "$PIDFILE"
  while kill -0 $PID 2>/dev/null; do
    sleep 30
    local age=$(( $(date +%s) - $(stat -c %Y "$log" 2>/dev/null || date +%s) ))
    if [ $age -gt 900 ]; then
      echo "[queue] stalled (${age}s) — killing $PID" >> "$log"
      kill $PID 2>/dev/null; sleep 10; kill -9 $PID 2>/dev/null
      break
    fi
  done
  wait $PID; local rc=$?
  [ "$(cat "$PIDFILE" 2>/dev/null)" = "$PID" ] && rm -f "$PIDFILE"
  return $rc
}

if [ ! -s "$RUN/eval500_mag.json" ]; then
  echo "[queue] magnitudes on 500-set days $(date -u +%H:%M:%S)"
  run "$RUN/mag500.log" timeout 4000 python -u "$R/scripts/nc_process.py" \
    --run "$RUN" --dataset 500 --days 2017_253 2017_259 \
    --thresh 0.25 --n-grids 1 --half --cache-sweep --save-catalog \
    --mag-model "$RUN/mag_model_nc.pkl" \
    --json-out "$RUN/eval500_mag.json"
fi

if [ -s "$RUN/corrections_holdout.npz" ] && [ ! -s "$RUN/eval_corr_2017_280.json" ]; then
  echo "[queue] corrections reprocessing day 2017_280 $(date -u +%H:%M:%S)"
  run "$RUN/corr280.log" timeout 4000 python -u "$R/scripts/nc_process.py" \
    --run "$RUN" --days 2017_280 --thresh 0.25 --n-grids 1 --half \
    --cache-sweep --corrections "$RUN/corrections_holdout.npz" \
    --json-out "$RUN/eval_corr_2017_280.json"
fi

echo "[queue] extended days $(date -u +%H:%M:%S)"
THRESHOLDS="0.25 0.35" bash "$R/scripts/nc_r5_campaign.sh" "$@"
echo "[queue] done $(date -u +%H:%M:%S)"
