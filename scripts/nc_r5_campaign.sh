#!/bin/bash
# Round-5 evaluation campaign: re-score the 10 cached days with the
# per-source association chain (thresholds 0.2/0.25/0.35, catalogs saved at
# 0.25), then extend the benchmark with further days (sweep + post in one
# pass per day at the fast rasterized-featurizer sweep). Serial on the one
# TPU tunnel; per-day stall watchdog kills a wedged stage by exact PID
# (observed: device round-trips can hang without raising).
#
#   scripts/nc_r5_campaign.sh <day>...
set -u
R=$(cd "$(dirname "$0")/.." && pwd)
RUN=$R/projects/NC_EHZ/run6
PIDFILE=$R/projects/NC_EHZ/.tpu_stage.pid
STALL_S=${STALL_S:-900}

run_day() {  # $1=day $2=log $3=out
  local day=$1 log=$2 out=$3
  python -u "$R/scripts/nc_process.py" --run "$RUN" --days "$day" \
    --thresh ${THRESHOLDS:-0.2 0.25 0.35} --n-grids 1 --half \
    --cache-sweep --save-catalog --catalog-thresh 0.25 --trace-usgs \
    --json-out "$out" >> "$log" 2>&1 &
  local PID=$!
  echo $PID > "$PIDFILE"
  while kill -0 $PID 2>/dev/null; do
    sleep 30
    local age=$(( $(date +%s) - $(stat -c %Y "$log" 2>/dev/null || date +%s) ))
    if [ $age -gt "$STALL_S" ]; then
      echo "[r5] $day stalled (${age}s silent) — killing $PID" >> "$log"
      kill $PID 2>/dev/null; sleep 10; kill -9 $PID 2>/dev/null
      break
    fi
  done
  wait $PID; local rc=$?
  [ "$(cat "$PIDFILE" 2>/dev/null)" = "$PID" ] && rm -f "$PIDFILE"
  return $rc
}

for day in "$@"; do
  out=$RUN/eval_${day}_g1.json
  marker=$RUN/.r5_done_${day}
  if [ -e "$marker" ]; then echo "[r5] $day done, skip"; continue; fi
  echo "[r5] $day start $(date -u +%H:%M:%S)"
  log=$RUN/process_${day}.log
  rc=1
  for attempt in 1 2 3; do
    run_day "$day" "$log" "$out"; rc=$?
    [ $rc -eq 0 ] && break
    echo "[r5] $day FAILED rc=$rc (attempt $attempt)"
    sleep 15
  done
  [ $rc -eq 0 ] && touch "$marker"
  echo "[r5] $day rc=$rc $(date -u +%H:%M:%S)"
done
echo "[r5] all days attempted"
