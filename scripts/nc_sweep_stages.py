#!/usr/bin/env python
"""Per-stage device-compute breakdown of the sweep window (bf16 production
config): featurize / product trunk / query head. Complements
nc_sweep_attrib.py (which showed 91% device compute): names WHICH stage to
optimize.

    python scripts/nc_sweep_stages.py --run projects/NC_EHZ/run6
"""

import argparse
import pickle
import sys
import time
from functools import partial
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
    ap.add_argument("--n-batches", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from genie_tpu.infer.pipeline import InferencePipeline, _make_graph
    from genie_tpu.models.detector import Detector
    from genie_tpu.synth.generator import featurize_window

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
    params_h = pipe._params_half

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

    def feat_only(tp, ip, ph, pm, sm):
        f, m = featurize_window(tp, ip, ph, pm, ctx.trv_grids[0],
                                cfg.train.src_t_kernel, sm)
        return f.astype(jnp.bfloat16).sum()

    def trunk_only(tp, ip, ph, pm, sm, nb, nv):
        f, m = featurize_window(tp, ip, ph, pm, ctx.trv_grids[0],
                                cfg.train.src_t_kernel, sm)
        f = f.astype(jnp.bfloat16)
        graph = _make_graph(ctx, 0, sm, nb, nv)
        xs, yl = model.apply(params_h, f, m, graph, ctx.sta_cart,
                             method=Detector.forward_trunk)
        return xs.sum() + yl.sum()

    def full(tp, ip, ph, pm, sm, nb, nv):
        f, m = featurize_window(tp, ip, ph, pm, ctx.trv_grids[0],
                                cfg.train.src_t_kernel, sm)
        f = f.astype(jnp.bfloat16)
        graph = _make_graph(ctx, 0, sm, nb, nv)
        y, x = model.apply(params_h, f, m, graph, ctx.sta_cart,
                           pipe.x_query, pipe._xq_idx[0], pipe.t_query,
                           method=Detector.forward_detection_only)
        return x.sum()

    fns = {
        "featurize": jax.jit(jax.vmap(feat_only, in_axes=(0, 0, 0, 0, None))),
        "feat+trunk": jax.jit(jax.vmap(trunk_only,
                                       in_axes=(0, 0, 0, 0, None, None, None))),
        "feat+trunk+queryhead": jax.jit(jax.vmap(
            full, in_axes=(0, 0, 0, 0, None, None, None))),
    }
    tails = {
        "featurize": (pipe.sta_mask,),
        "feat+trunk": (pipe.sta_mask, pipe.sta_nbr, pipe.sta_nbr_valid),
        "feat+trunk+queryhead": (pipe.sta_mask, pipe.sta_nbr, pipe.sta_nbr_valid),
    }
    prev = 0.0
    for name, fn in fns.items():
        np.asarray(fn(*batches[0], *tails[name]))  # compile
        t0 = time.time()
        for b in batches:
            np.asarray(fn(*b, *tails[name]))
        dt = (time.time() - t0) / len(batches)
        print(f"{name:24s} {dt:6.3f} s/batch (stage +{dt - prev:6.3f})",
              flush=True)
        prev = dt


if __name__ == "__main__":
    main()
