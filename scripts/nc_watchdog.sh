#!/bin/bash
# Watchdog for the long NC training run: the tunneled TPU backend can wedge
# (client blocks in futex wait, remote only trickles heartbeats — observed
# once at step ~2300). If the training stdout log goes stale for >STALE_S
# while the process is alive, kill that exact PID and restart from the last
# checkpoint (--restart resumes from run dir params.pkl, saved every 500
# steps).
#
# Usage: nc_watchdog.sh <pid> <logfile> <run_dir> [steps] [boost]
set -u
PID=$1
LOG=$2
RUN=$3
STEPS=${4:-15000}
BOOST=${5:-30}
STALE_S=${STALE_S:-900}
GRACE_S=${GRACE_S:-300}
POLL_S=${POLL_S:-60}
# TRAIN_CMD override exists so the restart path can be exercised in tests
TRAIN_CMD=${TRAIN_CMD:-"python scripts/nc_train.py --steps $STEPS --boost $BOOST --out $RUN --restart"}
cd "$(dirname "$0")/.."
while true; do
  sleep "$POLL_S"
  # done?
  if grep -qx "done" "$LOG" 2>/dev/null; then
    echo "[watchdog] training done; exiting" >> "$LOG"
    exit 0
  fi
  if ! kill -0 "$PID" 2>/dev/null; then
    # process died on its own: restart unless it finished
    last_step=$(grep -oE "^step [0-9]+" "$LOG" | tail -1 | awk '{print $2}')
    if [ "${last_step:-0}" -ge $((STEPS - 1)) ]; then
      echo "[watchdog] finished at step $last_step; exiting" >> "$LOG"
      exit 0
    fi
    echo "[watchdog] pid $PID gone at step ${last_step:-?}; restarting" >> "$LOG"
  else
    age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    [ "$age" -lt "$STALE_S" ] && continue
    echo "[watchdog] log stale ${age}s; killing $PID and restarting" >> "$LOG"
    kill "$PID" 2>/dev/null
    sleep 10
    kill -9 "$PID" 2>/dev/null
    sleep 5
  fi
  nohup $TRAIN_CMD >> "$LOG" 2>&1 &
  PID=$!
  # The watchdog owns the TPU-tunnel pidfile across restarts (bench.py guard
  # reads it): write unconditionally so a restarted stage is never untracked.
  echo $PID > "$RUN/../.tpu_stage.pid"
  echo "[watchdog] restarted as pid $PID" >> "$LOG"
  sleep "$GRACE_S"   # grace for restart preamble/compile
done
