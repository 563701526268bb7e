#!/usr/bin/env python
"""Micro-benchmark of the real-day detection sweep configurations.

Times the actual `InferencePipeline.detection_sweep` dispatch path on a
slice of a real BSSA day for the cross product of:

  * aggregation path: dense matmul (current inference default) vs
    fixed-k gather (the training path),
  * f32 vs bf16 trunk (``--half``),
  * ensemble size: all grids vs 1 grid.

Reports s/batch (16 windows/batch) and the implied full-day wall time, and
cross-checks that every config's stacked series agrees with the first
(max |Δ| on the day slice) so speed never silently buys wrong answers.

Usage: python scripts/nc_sweep_bench.py --run projects/NC_EHZ/run4_pref
"""

import argparse
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
    ap.add_argument("--run", default=str(PROJECT_ROOT / "run4_pref"))
    ap.add_argument("--day", default="2017_274")
    ap.add_argument("--t-end", type=float, default=4000.0,
                    help="slice length (s); 4000 s = 25 window batches")
    ap.add_argument("--min-prob", type=float, default=0.3)
    ap.add_argument("--n-query", type=int, default=10000)
    ap.add_argument("--quick", action="store_true",
                    help="only the production config (matmul bf16 1-grid) "
                         "at window_batch 16/32/64")
    ap.add_argument("--profile", default=None,
                    help="capture a jax.profiler trace of the production "
                         "config sweep into this directory")
    args = ap.parse_args()

    import pickle

    from genie_tpu.infer.pipeline import InferencePipeline
    from genie_tpu.models.detector import Detector

    run_dir = Path(args.run)
    blob = pickle.loads((run_dir / "params.pkl").read_bytes())
    params = blob["params"] if isinstance(blob, dict) and "params" in blob else blob

    cfg, ctx, proj, trv, sta_lla = build_runtime(run_dir, n_query=args.n_query)
    pick_t, pick_sta, pick_ph, prob, sta_ind, _, _ = load_day(args.day)[:7]
    keep = prob >= args.min_prob
    pick_t, pick_sta, pick_ph = pick_t[keep], pick_sta[keep], pick_ph[keep]

    n_day_batches = 86400.0 / cfg.model.t_win * cfg.process.step_size / 16.0

    def one(label, via_matmul, half, grids, window_batch=16):
        model = Detector(
            src_chunk=16, normalize_readin=cfg.model.normalize_readin,
            via_matmul=via_matmul,
            scale_rel=cfg.model.scale_rel, kernel_sig_t=cfg.model.kernel_sig_t,
            use_phase_types=cfg.model.use_phase_types,
            use_absolute_pos=cfg.model.use_absolute_pos,
            use_updated_model_definition=cfg.model.use_updated_model_definition)
        pipe = InferencePipeline(model, params, cfg, ctx, trv.from_cart,
                                 verbose=False, sweep_half=half)
        pipe.set_station_mask(sta_ind)
        # warm-up/compile on a short prefix
        pipe.detection_sweep(pick_t, pick_sta, pick_ph, 0.0, 400.0,
                             grids=grids, window_batch=window_batch)
        t0 = time.time()
        times_s, series = pipe.detection_sweep(
            pick_t, pick_sta, pick_ph, 0.0, args.t_end, grids=grids,
            window_batch=window_batch)
        dt = time.time() - t0
        n_batches = int(np.ceil(args.t_end / cfg.model.t_win
                                * cfg.process.step_size / window_batch))
        n_day_b = n_day_batches * 16.0 / window_batch
        day_s = dt / n_batches * n_day_b
        print(f"{label:42s} {dt / n_batches:6.2f} s/batch "
              f"-> full day ~{day_s / 60:6.1f} min", flush=True)
        return series

    all_grids = list(range(ctx.grids_cart.shape[0]))
    if args.profile:
        # trace the production config: compile outside, trace ~6 batches
        import jax
        from genie_tpu.models.detector import Detector as _D
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
        pipe.detection_sweep(pick_t, pick_sta, pick_ph, 0.0, 400.0, grids=[0])
        with jax.profiler.trace(args.profile):
            pipe.detection_sweep(pick_t, pick_sta, pick_ph, 1000.0, 2000.0,
                                 grids=[0])
        print(f"trace written to {args.profile}", flush=True)
        return
    if args.quick:
        ref = one("matmul bf16 1-grid wb16 (production)", True, True, [0], 16)
        for wb in (32, 64):
            s = one(f"matmul bf16 1-grid wb{wb}", True, True, [0], wb)
        return
    ref = one("matmul f32 all-grids (campaign r2 cfg)", True, False, all_grids)
    for label, vm, hf, gr, wb in [
            ("matmul bf16 all-grids (--half)", True, True, all_grids, 16),
            ("gather f32 all-grids", False, False, all_grids, 16),
            ("gather bf16 all-grids", False, True, all_grids, 16),
            ("matmul bf16 1-grid", True, True, [0], 16),
            ("gather bf16 1-grid", False, True, [0], 16),
            ("matmul bf16 all-grids wb64", True, True, all_grids, 64),
            ("gather bf16 all-grids wb64", False, True, all_grids, 64),
    ]:
        s = one(label, vm, hf, gr, wb)
        if s.shape == ref.shape:
            d = float(np.max(np.abs(s - ref)))
            print(f"    max |delta| vs reference config: {d:.4f}", flush=True)


if __name__ == "__main__":
    main()
