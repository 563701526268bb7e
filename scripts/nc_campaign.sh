#!/bin/bash
# Post-training BSSA evaluation campaign: waits for the NC training run to
# print its done marker, then processes benchmark days sequentially (one
# nc_process invocation per day so a crash loses only later days), each with
# multi-threshold scoring vs USGS + the reference's own detections, sweep
# caching, per-event probes, and a saved catalog; finally GraphDD-relocates
# the first day's catalog.
#
# Usage: nc_campaign.sh <train_log> <run_dir> [day ...]
set -u
LOG=$1
RUN=$2
shift 2
DAYS=${@:-"2017_274 2017_275 2017_276 2017_282"}
THRESH="0.1 0.15 0.2 0.25 0.35 0.45 0.3"   # last one is the saved-catalog operating point
cd "$(dirname "$0")/.."
CLOG=$RUN/campaign.log

echo "[campaign] waiting for training done marker in $LOG" >> "$CLOG"
while ! grep -qx "done" "$LOG" 2>/dev/null; do sleep 60; done
echo "[campaign] training done at $(date -u +%H:%M:%S); starting evaluation" >> "$CLOG"

for day in $DAYS; do
  echo "[campaign] === day $day $(date -u +%H:%M:%S) ===" >> "$CLOG"
  python scripts/nc_process.py --run "$RUN" --days "$day" \
    --thresh $THRESH --probe --cache-sweep --save-catalog --half \
    --json-out "$RUN/eval_${day}.json" >> "$CLOG" 2>&1
done

echo "[campaign] === relocation $(date -u +%H:%M:%S) ===" >> "$CLOG"
python scripts/nc_relocate.py --run "$RUN" --day 2017_274 >> "$CLOG" 2>&1
echo "[campaign] finished $(date -u +%H:%M:%S)" >> "$CLOG"
