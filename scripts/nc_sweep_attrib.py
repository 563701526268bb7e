#!/usr/bin/env python
"""Attribute the day-sweep s/batch between device compute and tunnel
transfer (VERDICT r4 weak #3: "sweep speed is accepted, not understood").

Three measurements on the production config (matmul bf16 1-grid wb16):

  * full:    dispatch batch + fetch the dense (16, n_q, n_t) output
  * compute: dispatch batch + fetch only a scalar reduction (max) —
             device compute without the payload transfer
  * wire:    repeatedly fetch a resident device array of the same payload
             size — pure tunnel bandwidth

    python scripts/nc_sweep_attrib.py --run projects/NC_EHZ/run6
"""

import argparse
import pickle
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from nc_common import PROJECT_ROOT, load_day
from nc_process import build_runtime


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default=str(PROJECT_ROOT / "run6"))
    ap.add_argument("--day", default="2017_274")
    ap.add_argument("--n-batches", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from genie_tpu.infer.pipeline import InferencePipeline
    from genie_tpu.models.detector import Detector

    run_dir = Path(args.run)
    blob = pickle.loads((run_dir / "params.pkl").read_bytes())
    params = blob["params"] if isinstance(blob, dict) and "params" in blob else blob
    cfg, ctx, proj, trv, sta_lla = build_runtime(run_dir, n_query=10000)
    pick_t, pick_sta, pick_ph, prob, sta_ind, _, _ = load_day(args.day)[:7]
    keep = prob >= 0.3
    pick_t, pick_sta, pick_ph = pick_t[keep], pick_sta[keep], pick_ph[keep]

    model = Detector(
        src_chunk=16, normalize_readin=cfg.model.normalize_readin,
        via_matmul=True, scale_rel=cfg.model.scale_rel,
        kernel_sig_t=cfg.model.kernel_sig_t,
        use_phase_types=cfg.model.use_phase_types,
        use_absolute_pos=cfg.model.use_absolute_pos,
        use_updated_model_definition=cfg.model.use_updated_model_definition)
    pipe = InferencePipeline(model, params, cfg, ctx, trv.from_cart,
                             verbose=False, sweep_half=True)
    pipe.set_station_mask(sta_ind)

    # build window batches exactly like detection_sweep
    step = cfg.model.t_win / cfg.process.step_size
    t0s = np.arange(1000.0, 1000.0 + step * 16 * (args.n_batches + 2), step)
    wins = []
    for t0 in t0s:
        tp, ip, ph, pm, _ = pipe._window_picks(pick_t, pick_sta, pick_ph, t0)
        if pm.sum():
            wins.append((tp, ip, ph, pm))
    batches = []
    for s in range(0, len(wins) - 16 + 1, 16):
        c = wins[s:s + 16]
        batches.append(tuple(jnp.asarray(np.stack([w[k] for w in c]))
                             for k in range(4)))
    batches = batches[:args.n_batches]
    print(f"{len(batches)} batches of 16 windows", flush=True)

    fn = pipe._sweep_batch_fn
    red = jax.jit(lambda tp, ip, ph, pm, sm, nb, nv: fn(tp, ip, ph, pm, sm, nb, nv, 0).max())
    args_tail = (pipe.sta_mask, pipe.sta_nbr, pipe.sta_nbr_valid, 0)

    # warm-up both programs
    np.asarray(fn(*batches[0], *args_tail))
    np.asarray(red(*batches[0], *args_tail[:3]))

    t0 = time.time()
    for b in batches:
        np.asarray(fn(*b, *args_tail))
    t_full = (time.time() - t0) / len(batches)

    t0 = time.time()
    for b in batches:
        np.asarray(red(*b, *args_tail[:3]))
    t_comp = (time.time() - t0) / len(batches)

    payload = fn(*batches[0], *args_tail)
    payload.block_until_ready()
    nbytes = payload.size * payload.dtype.itemsize
    t0 = time.time()
    n_rep = 10
    for _ in range(n_rep):
        np.asarray(payload)
    t_wire = (time.time() - t0) / n_rep

    print(f"full (compute + fetch dense): {t_full:6.3f} s/batch")
    print(f"compute only (scalar fetch):  {t_comp:6.3f} s/batch")
    print(f"wire only ({nbytes/1e6:.2f} MB fetch):  {t_wire:6.3f} s/batch "
          f"-> {nbytes/1e6/t_wire:.1f} MB/s")
    print(f"attribution: compute {t_comp/t_full:4.0%}, "
          f"transfer {t_wire/t_full:4.0%}, "
          f"other {(t_full-t_comp-t_wire)/t_full:4.0%}")


if __name__ == "__main__":
    main()
