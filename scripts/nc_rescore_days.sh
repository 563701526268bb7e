#!/bin/bash
# Re-score campaign days from their CACHED sweeps with one consistent code
# state: thresholds 0.2/0.25/0.35, catalogs saved at 0.25 (for the pooled
# calibration / magnitude / GraphDD passes). Cheap per day — the sweep is
# the expensive stage and it is cache-hit here (0.35 rows already exist
# from the campaign JSONs). Same stall watchdog as
# nc_days_campaign.sh (the tunnel can wedge at client init).
#
#   scripts/nc_rescore_days.sh <run_dir> <n_grids> <day>...
set -u
R=$(cd "$(dirname "$0")/.." && pwd)
RUN=${1:?run dir}; NG=${2:?n_grids}; shift 2
PIDFILE=$R/projects/NC_EHZ/.tpu_stage.pid
STALL_S=${STALL_S:-1200}

for day in "$@"; do
  out=$R/$RUN/eval_rescore_${day}_g${NG}.json
  if [ -s "$out" ]; then echo "[rescore] $day done, skip"; continue; fi
  if ! ls "$R/$RUN"/sweep_${day}_*_g${NG}.npz >/dev/null 2>&1; then
    echo "[rescore] $day: no cached sweep, skip"; continue
  fi
  echo "[rescore] $day start $(date -u +%H:%M:%S)"
  log=$R/$RUN/rescore_${day}.log
  rc=1
  for attempt in 1 2 3; do
    python -u "$R/scripts/nc_process.py" --run "$R/$RUN" --days "$day" \
      --thresh ${RESCORE_THRESH:-0.2 0.25} --n-grids "$NG" --half \
      --cache-sweep --save-catalog --catalog-thresh 0.25 --json-out "$out" \
      >> "$log" 2>&1 &
    PID=$!
    echo $PID > "$PIDFILE"
    while kill -0 $PID 2>/dev/null; do
      sleep 30
      age=$(( $(date +%s) - $(stat -c %Y "$log" 2>/dev/null || date +%s) ))
      if [ $age -gt "$STALL_S" ]; then
        echo "[rescore] $day stalled (${age}s) — killing $PID" >> "$log"
        kill $PID 2>/dev/null; sleep 10; kill -9 $PID 2>/dev/null
        break
      fi
    done
    wait $PID; rc=$?
    [ "$(cat "$PIDFILE" 2>/dev/null)" = "$PID" ] && rm -f "$PIDFILE"
    [ $rc -eq 0 ] && break
    echo "[rescore] $day FAILED rc=$rc (attempt $attempt)"; sleep 15
  done
  echo "[rescore] $day rc=$rc $(date -u +%H:%M:%S)"
done
echo "[rescore] all days attempted"
