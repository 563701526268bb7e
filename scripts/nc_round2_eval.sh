#!/bin/bash
# Round-2 evaluation orchestrator: runs after the NC training run finishes.
# Waits for the done marker, then (all on the one TPU, sequentially):
#   1. sweep-config micro-benchmark (records s/batch per config),
#   2. headline day 2017_274 with the full grid ensemble + probe + catalog,
#   3. remaining days at a cheaper ensemble for breadth,
#   4. GraphDD relocation of the day-274 catalog,
#   5. magnitude assignment via the fitted mag model when present.
#
# Usage: nc_round2_eval.sh <train_log> <run_dir> [stop_at_step]
set -u
LOG=$1
RUN=$2
STOP_AT=${3:-0}
cd "$(dirname "$0")/.."
CLOG=$RUN/campaign.log
THRESH="0.45 0.35 0.3 0.2 0.25"  # high->low; last = saved-catalog operating point
# (0.1/0.15 re-scorable later from the cached sweep; at low thresholds the
#  association/location stages dominate and can take hours per threshold)

echo "[eval] waiting for done marker in $LOG" >> "$CLOG"
while ! grep -qx "done" "$LOG" 2>/dev/null; do
  if [ "$STOP_AT" -gt 0 ]; then
    last=$(grep -oE "^step [0-9]+" "$LOG" | tail -1 | awk '{print $2}')
    if [ "${last:-0}" -ge "$STOP_AT" ]; then
      echo "[eval] reached stop_at_step=$STOP_AT (step $last); stopping trainer" >> "$CLOG"
      # exact PIDs only: launch-time pidfiles, overridden by the last
      # watchdog-recorded restart pid in the train log (never kill by pattern)
      wpid=$(cat "$RUN/watchdog.pid" 2>/dev/null)
      pid=$(grep -oE "restarted as pid [0-9]+" "$LOG" | tail -1 | grep -oE "[0-9]+$")
      [ -z "${pid:-}" ] && pid=$(cat "$RUN/train.pid" 2>/dev/null)
      [ -n "${wpid:-}" ] && kill "$wpid" 2>/dev/null
      sleep 2
      [ -n "${pid:-}" ] && kill "$pid" 2>/dev/null
      sleep 20
      break
    fi
  fi
  sleep 60
done
echo "[eval] training finished at $(date -u +%H:%M:%S)" >> "$CLOG"

MAG=""
[ -f "$RUN/../run2/mag_model.pkl" ] && MAG="--mag-model $RUN/../run2/mag_model.pkl"
[ -f "$RUN/mag_model.pkl" ] && MAG="--mag-model $RUN/mag_model.pkl"

echo "[eval] === sweep bench $(date -u +%H:%M:%S) ===" >> "$CLOG"
timeout 2400 python -u scripts/nc_sweep_bench.py --run "$RUN" >> "$CLOG" 2>&1

# pick the faster aggregation path for the day sweeps (exactness is
# cross-checked inside the bench; default matmul if the bench failed)
GFLAG=""
gs=$(grep -oE "gather bf16 all-grids +[0-9.]+" "$CLOG" | tail -1 | grep -oE "[0-9.]+$")
ms=$(grep -oE "matmul bf16 all-grids \(--half\) +[0-9.]+" "$CLOG" | tail -1 | grep -oE "[0-9.]+$")
if [ -n "$gs" ] && [ -n "$ms" ]; then
  faster=$(python -c "print('g' if $gs < $ms else 'm')")
  [ "$faster" = g ] && GFLAG="--gather"
fi
echo "[eval] aggregation path: ${GFLAG:-matmul} (gather $gs vs matmul $ms s/batch)" >> "$CLOG"

# pre-flight: pick the PhaseNet probability floor by probe score. The
# reference processes ALL picks (utils.py:983 load_picks thresh_cut=None);
# our round-1 harness floored at 0.3. A/B a half-day 1-grid sweep.
echo "[eval] === min-prob A/B $(date -u +%H:%M:%S) ===" >> "$CLOG"
MP=0.3
timeout 3000 python -u scripts/nc_process.py --run "$RUN" --days 2017_274 \
  --thresh 0.3 --probe --n-grids 1 --t-end 43200 --half $GFLAG \
  --min-prob 0.0 > "$RUN/ab_mp00.log" 2>&1
timeout 3000 python -u scripts/nc_process.py --run "$RUN" --days 2017_274 \
  --thresh 0.3 --probe --n-grids 1 --t-end 43200 --half $GFLAG \
  --min-prob 0.3 > "$RUN/ab_mp03.log" 2>&1
m0=$(grep -oE "median score [0-9.]+" "$RUN/ab_mp00.log" | tail -1 | grep -oE "[0-9.]+$")
m3=$(grep -oE "median score [0-9.]+" "$RUN/ab_mp03.log" | tail -1 | grep -oE "[0-9.]+$")
if [ -n "$m0" ] && [ -n "$m3" ]; then
  MP=$(python -c "print(0.0 if $m0 > $m3 else 0.3)")
fi
echo "[eval] min-prob A/B: p0.0 median $m0 vs p0.3 median $m3 -> --min-prob $MP" >> "$CLOG"

echo "[eval] === day 2017_274 (full ensemble) $(date -u +%H:%M:%S) ===" >> "$CLOG"
python -u scripts/nc_process.py --run "$RUN" --days 2017_274 \
  --thresh $THRESH --probe --cache-sweep --save-catalog --half $GFLAG $MAG \
  --min-prob $MP --json-out "$RUN/eval_2017_274.json" >> "$CLOG" 2>&1


echo "[eval] === relocation $(date -u +%H:%M:%S) ===" >> "$CLOG"
python -u scripts/nc_relocate.py --run "$RUN" --day 2017_274 >> "$CLOG" 2>&1

for day in 2017_275 2017_276 2017_282; do
  echo "[eval] === day $day (2-grid) $(date -u +%H:%M:%S) ===" >> "$CLOG"
  python -u scripts/nc_process.py --run "$RUN" --days "$day" \
    --thresh $THRESH --probe --cache-sweep --save-catalog --half $GFLAG \
    --n-grids 2 $MAG --min-prob $MP \
    --json-out "$RUN/eval_${day}.json" >> "$CLOG" 2>&1
done

echo "[eval] finished $(date -u +%H:%M:%S)" >> "$CLOG"
