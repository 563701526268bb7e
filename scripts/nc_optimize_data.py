#!/usr/bin/env python
"""Bayesian optimization of the synthetic-data generator against real pick
statistics — the reference's disabled ``optimize_training_data`` flow
(train_GENIE_model.py:1887-2160), running natively.

Collects ``sample_picks`` targets from real BSSA pick days, then GP-EI
minimizes the relative statistic residual of on-device synthetic timelines
over the reference's 11-parameter box. Saves the optimized parameters npz
(the reference's ``..._optimized_training_data_parameters_ver_1.npz``
artifact, :2156).

    JAX_PLATFORMS=cpu PYTHONPATH= python scripts/nc_optimize_data.py \
        --days 2017_274 2017_275 --n-calls 40 [--save out.npz]
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from nc_common import PROJECT_ROOT, load_day, nc_config, nc_projection


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--days", nargs="+", default=["2017_274"])
    ap.add_argument("--dataset", default="100")
    ap.add_argument("--min-prob", type=float, default=0.3)
    ap.add_argument("--n-calls", type=int, default=40)
    ap.add_argument("--n-random-starts", type=int, default=15)
    ap.add_argument("--t-synth", type=float, default=10800.0,
                    help="synthetic timeline length per evaluation (s)")
    ap.add_argument("--save", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from genie_tpu.synth.generator import synthesize_timeline
    from genie_tpu.train.bayes_opt import (PARAM_SPACE, apply_params,
                                           gp_minimize, pick_statistics,
                                           stats_residual)
    from genie_tpu.workflow import make_trv
    from nc_process import build_runtime

    run_dir = PROJECT_ROOT / "run6"
    cfg, ctx, proj, trv, sta_lla = build_runtime(run_dir)
    sta_cart = np.asarray(ctx.sta_cart)

    targets = []
    for day in args.days:
        pick_t, pick_sta, pick_ph, prob, ind_use, cat, _ = load_day(
            day, dataset=args.dataset)
        keep = prob >= args.min_prob
        targets.append(pick_statistics(pick_t[keep], pick_sta[keep], sta_cart))
        print(f"[opt] {day}: {int(keep.sum())} picks -> targets", flush=True)

    cfg.synth.T = args.t_synth
    depth_rng = (float(ctx.offset_cart[2]),
                 float(ctx.offset_cart[2] + ctx.scale_cart[2]))
    key_pool = jax.random.split(jax.random.PRNGKey(7), args.n_calls + 8)
    n_eval = [0]

    def objective(x):
        apply_params(cfg.synth, x)
        k = key_pool[n_eval[0] % len(key_pool)]
        n_eval[0] += 1
        tl = synthesize_timeline(k, cfg.synth, jnp.asarray(sta_cart),
                                 trv.from_cart, ctx.scale_cart,
                                 ctx.offset_cart, depth_rng,
                                 n_sta_real=sta_cart.shape[0])
        m = np.asarray(tl.pick_mask)
        stats = pick_statistics(np.asarray(tl.pick_t)[m],
                                np.asarray(tl.pick_sta)[m], sta_cart)
        return stats_residual(stats, targets)

    def cb(i, x, y):
        print(f"[opt] call {i + 1}/{args.n_calls}: resid {y:.4f}", flush=True)

    x_best, y_best, X, Y = gp_minimize(
        objective, [(p[1], p[2]) for p in PARAM_SPACE],
        n_calls=args.n_calls, n_random_starts=args.n_random_starts,
        callback=cb)

    names = [p[0] for p in PARAM_SPACE]
    out = {"residual": round(y_best, 4),
           "params": {n: round(float(v), 4) for n, v in zip(names, x_best)}}
    print(json.dumps(out), flush=True)
    if args.save:
        np.savez_compressed(args.save, x=x_best, res=y_best, X=X, Y=Y,
                            strings=np.asarray(names))
        print(f"[opt] saved {args.save}", flush=True)


if __name__ == "__main__":
    main()
