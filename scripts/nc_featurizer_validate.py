#!/usr/bin/env python
"""End-to-end validation of the rasterized sweep featurizer: sweep the same
real-day slice with featurizer=searchsorted and featurizer=rasterized
(both bf16 production config) and compare the stacked series everywhere it
matters (bins above ~half the lowest operating threshold).

    python scripts/nc_featurizer_validate.py --run projects/NC_EHZ/run6
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
    ap.add_argument("--t-start", type=float, default=28000.0,
                    help="slice start (day 274 has USGS events 28-32 ks)")
    ap.add_argument("--t-end", type=float, default=32000.0)
    args = ap.parse_args()

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

    out = {}
    for fz in ("searchsorted", "rasterized"):
        pipe = InferencePipeline(model, params, cfg, ctx, trv.from_cart,
                                 verbose=False, sweep_half=True, featurizer=fz)
        pipe.set_station_mask(sta_ind)
        pipe.detection_sweep(pick_t, pick_sta, pick_ph, 0.0, 400.0, grids=[0])
        t0 = time.time()
        times_s, series = pipe.detection_sweep(
            pick_t, pick_sta, pick_ph, args.t_start, args.t_end, grids=[0])
        dt = time.time() - t0
        n_b = int(np.ceil((args.t_end - args.t_start) / cfg.model.t_win
                          * cfg.process.step_size / 16))
        print(f"{fz:13s}: {dt:6.1f}s slice, {dt / n_b:5.2f} s/batch "
              f"-> full day ~{dt / n_b * 1080 / 60:5.1f} min", flush=True)
        out[fz] = (times_s, series)

    a, b = out["searchsorted"][1], out["rasterized"][1]
    hot = a >= 0.10
    print(f"series max: ss {a.max():.3f} vs ras {b.max():.3f}")
    print(f"max |Δ| overall: {np.abs(a - b).max():.4f}")
    if hot.any():
        print(f"max |Δ| on {hot.sum()} bins with ss>=0.10: "
              f"{np.abs(a[hot] - b[hot]).max():.4f}")
    # would any plausible operating point change? count threshold crossings
    for th in (0.2, 0.25, 0.35):
        na, nb = int((a >= th).sum()), int((b >= th).sum())
        print(f"bins >= {th}: ss {na} vs ras {nb}")


if __name__ == "__main__":
    main()
