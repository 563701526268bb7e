#!/bin/bash
# Multi-day BSSA processing campaign (VERDICT r2 item 3: >=10 days).
# Serial day loop on the single TPU tunnel, one eval JSON per day, skip
# days already done, pidfile maintained for bench.py's tunnel guard.
# Per-day crash resilience comes from nc_process's sweep retry + partial
# checkpoints; the loop itself re-runs any day without a JSON on restart.
#
# Stall watchdog: a wedged TPU-tunnel call can hang a device round-trip
# WITHOUT raising (observed: 30+ min futex wait at sweep batch 1000/1080),
# which the in-process retry cannot catch. If the day's log goes stale for
# > STALL_S seconds the stage is killed by exact PID; the retry pass then
# resumes from the last sweep checkpoint (~40 batches lost at most).
# STALL_S must exceed the longest legitimately silent phase (sweep-npz
# compression + the refine/locate stages print nothing for up to ~10 min).
#
#   scripts/nc_days_campaign.sh <run_dir> <n_grids> <half:0|1> <day>...
set -u
R=$(cd "$(dirname "$0")/.." && pwd)
RUN=${1:?run dir}; NG=${2:?n_grids}; HALF=${3:?half 0/1}; shift 3
PIDFILE=$R/projects/NC_EHZ/.tpu_stage.pid
STALL_S=${STALL_S:-1200}
HARG=""; [ "$HALF" = 1 ] && HARG="--half"

run_day() {  # $1=day $2=log $3=out; returns stage rc (143 on stall kill)
  local day=$1 log=$2 out=$3
  python -u "$R/scripts/nc_process.py" --run "$R/$RUN" --days "$day" \
    --thresh ${THRESHOLDS:-0.25 0.35} --n-grids "$NG" $HARG \
    --cache-sweep --save-catalog --json-out "$out" \
    >> "$log" 2>&1 &
  local PID=$!
  echo $PID > "$PIDFILE"
  while kill -0 $PID 2>/dev/null; do
    sleep 30
    local age=$(( $(date +%s) - $(stat -c %Y "$log" 2>/dev/null || date +%s) ))
    if [ $age -gt "$STALL_S" ]; then
      echo "[campaign] $day stalled (${age}s silent) — killing $PID" >> "$log"
      kill $PID 2>/dev/null; sleep 10; kill -9 $PID 2>/dev/null
      break
    fi
  done
  wait $PID; local rc=$?
  [ "$(cat "$PIDFILE" 2>/dev/null)" = "$PID" ] && rm -f "$PIDFILE"
  return $rc
}

for day in "$@"; do
  out=$R/$RUN/eval_${day}_g${NG}.json
  if [ -s "$out" ]; then echo "[campaign] $day done, skip"; continue; fi
  echo "[campaign] $day start $(date -u +%H:%M:%S)"
  log=$R/$RUN/process_${day}.log
  rc=1
  for attempt in 1 2 3; do
    run_day "$day" "$log" "$out"; rc=$?
    [ $rc -eq 0 ] && break
    echo "[campaign] $day FAILED rc=$rc (attempt $attempt)"
    sleep 15
  done
  echo "[campaign] $day rc=$rc $(date -u +%H:%M:%S)"
done
echo "[campaign] all days attempted"
