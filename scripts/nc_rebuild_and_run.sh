#!/bin/bash
# From-scratch NC artifact rebuild + time-boxed training + headline-day eval.
# Chain: FMM tables (CPU shards; idempotent, skip existing) -> PINN surrogate
# (TPU) -> detector training with the fixed preferential sampling -> process
# day 2017_274. Each stage logs to projects/NC_EHZ/*.log; checkpoints land
# every --ckpt-every steps so a mid-run kill still leaves a usable model.
#
# FMM shards are forced onto CPU (PYTHONPATH= JAX_PLATFORMS=cpu): the axon
# TPU tunnel admits ONE client, and a second jax-initializing process blocks
# forever waiting for it.
#
# Usage: nc_rebuild_and_run.sh [train_steps] [run_dir] [shard_list]
set -u
cd "$(dirname "$0")/.."
STEPS=${1:-3000}
RUN=${2:-projects/NC_EHZ/run5}
SHARDS=${3:-"0 1 2 3"}
R=projects/NC_EHZ
mkdir -p "$R"

N_STA=374
count() { ls "$R/TravelTimeData" 2>/dev/null | wc -l; }

if [ "$(count)" -lt "$N_STA" ]; then
  echo "[chain] FMM build start $(date -u +%H:%M:%S) ($(count)/$N_STA done)"
  for j in $SHARDS; do
    PYTHONPATH= JAX_PLATFORMS=cpu python scripts/nc_fmm_build.py "$j" 4 \
      > "$R/fmm_$j.log" 2>&1 &
  done
  wait
  # Our shards are done; other shard processes may still be running outside
  # this script — wait for them, but bounded: if the count stops advancing
  # for 10 minutes, a foreign shard crashed, so re-dispatch the stragglers
  # ourselves (the FMM builder is idempotent and skips completed stations).
  stall=0; prev=$(count)
  while [ "$(count)" -lt "$N_STA" ]; do
    sleep 15
    cur=$(count)
    if [ "$cur" -gt "$prev" ]; then stall=0; prev=$cur; else stall=$((stall+15)); fi
    if [ "$stall" -ge 600 ]; then
      echo "[chain] FMM stalled at $cur/$N_STA; re-dispatching stragglers"
      PYTHONPATH= JAX_PLATFORMS=cpu python scripts/nc_fmm_build.py 0 1 \
        >> "$R/fmm_retry.log" 2>&1
      if [ "$(count)" -lt "$N_STA" ]; then
        echo "[chain] FMM still incomplete after retry; aborting" >&2
        exit 1
      fi
    fi
  done
  echo "[chain] FMM done $(date -u +%H:%M:%S)"
fi

# TPU stages record their PID so bench.py (and other tools) can wait for /
# reclaim the single-client TPU tunnel (see bench.py:wait_for_tpu_tunnel).
PIDFILE=$R/.tpu_stage.pid
tpu_stage() {  # tpu_stage <log> <cmd...>
  local log=$1; shift
  "$@" > "$log" 2>&1 &
  local pid=$!
  echo $pid > "$PIDFILE"
  wait $pid
  local rc=$?
  # Only clean up OUR record: a watchdog may have restarted the stage and
  # rewritten the pidfile with the new PID — never remove someone else's.
  if [ "$(cat "$PIDFILE" 2>/dev/null)" = "$pid" ]; then rm -f "$PIDFILE"; fi
  return $rc
}

if [ ! -f "$R/Grids/pinn_nc.pkl" ]; then
  echo "[chain] PINN start $(date -u +%H:%M:%S)"
  tpu_stage "$R/pinn.log" python scripts/nc_pinn.py --steps 25000
  rc=$?
  if [ "$rc" -ne 0 ] || [ ! -f "$R/Grids/pinn_nc.pkl" ]; then
    echo "[chain] PINN stage failed (rc=$rc, artifact $([ -f "$R/Grids/pinn_nc.pkl" ] && echo present || echo absent)); aborting" >&2
    exit 1
  fi
  echo "[chain] PINN done $(date -u +%H:%M:%S)"
fi

echo "[chain] train start $(date -u +%H:%M:%S)"
tpu_stage "$R/train.log" python -u scripts/nc_train.py --steps "$STEPS" \
  --trv pinn --boost 30 --ckpt-every 250 --out "$RUN"
echo done >> "$R/train.log"
echo "[chain] train done $(date -u +%H:%M:%S)"

echo "[chain] process start $(date -u +%H:%M:%S)"
tpu_stage "$R/process.log" python -u scripts/nc_process.py --run "$RUN" \
  --days 2017_274 \
  --thresh 0.45 0.35 0.3 0.25 0.2 --probe --cache-sweep --save-catalog --half \
  --json-out "$RUN/eval_2017_274.json"
echo "[chain] finished $(date -u +%H:%M:%S)"
