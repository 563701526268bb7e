#!/bin/bash
# Sweep-only campaign pass: compute + cache day detection sweeps serially on
# the one TPU tunnel, skipping days whose cache already exists. The eval pass
# (nc_days_campaign.sh) runs later from the caches with the batched
# post-processing — decoupling lets the slow sweeps saturate the TPU while
# the post-processing code evolves.
#
#   scripts/nc_sweep_campaign.sh <run_dir> <n_grids> <half:0|1> <day>...
set -u
R=$(cd "$(dirname "$0")/.." && pwd)
RUN=${1:?run dir}; NG=${2:?n_grids}; HALF=${3:?half 0/1}; shift 3
PIDFILE=$R/projects/NC_EHZ/.tpu_stage.pid
HARG=""; HTAG=""
[ "$HALF" = 1 ] && HARG="--half" && HTAG="_bf16"

for day in "$@"; do
  if ls "$R/$RUN"/sweep_${day}_*${HTAG}_g${NG}.npz >/dev/null 2>&1; then
    echo "[sweep-campaign] $day cached, skip"; continue
  fi
  echo "[sweep-campaign] $day start $(date -u +%H:%M:%S)"
  rc=1
  for attempt in 1 2; do
    python -u "$R/scripts/nc_process.py" --run "$R/$RUN" --days "$day" \
      --sweep-only --n-grids "$NG" $HARG --cache-sweep \
      >> "$R/$RUN/process_${day}.log" 2>&1 &
    PID=$!
    echo $PID > "$PIDFILE"
    wait $PID; rc=$?
    [ "$(cat "$PIDFILE" 2>/dev/null)" = "$PID" ] && rm -f "$PIDFILE"
    [ $rc -eq 0 ] && break
    echo "[sweep-campaign] $day FAILED rc=$rc (attempt $attempt)"
  done
  echo "[sweep-campaign] $day rc=$rc $(date -u +%H:%M:%S)"
done
echo "[sweep-campaign] all days attempted"
