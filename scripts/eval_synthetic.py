#!/usr/bin/env python
"""End-to-end quality evaluation on synthetic data.

Trains the Detector on a synthetic domain, then runs the full inference
pipeline on a fresh synthetic pick timeline and scores detections against
the planted events with the bipartite matcher — the framework's equivalent
of the reference's BSSA matched-catalog evaluation (association F1, epicenter
and origin-time residuals).

    python scripts/eval_synthetic.py [--steps 500] [--n-sta 32] [--json]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def build(args):
    import jax
    import jax.numpy as jnp
    from genie_tpu.config import Config
    from genie_tpu.geometry import Projection
    from genie_tpu.models.travel_time import HomogeneousTravelTime
    from genie_tpu.train.trainer import build_domain_context

    cfg = Config()
    cfg.graph.max_sta = args.n_sta
    cfg.graph.n_spatial_nodes = args.n_src
    cfg.graph.n_grids = 2
    cfg.graph.max_picks = 256
    cfg.train.n_batch = args.n_batch
    cfg.train.n_spc_query = 1000
    cfg.train.n_src_query = 64
    cfg.synth.max_events = 64
    cfg.synth.n_false_max = 1024
    cfg.synth.T = 3600.0
    cfg.synth.max_rate_events = 30.0
    cfg.synth.min_sta_arrival = 4
    cfg.synth.min_pick_arrival = 6
    cfg.synth.dist_range = (15e3, 200e3)
    cfg.process.thresh = args.thresh
    cfg.process.thresh_assoc = args.thresh
    cfg.process.min_required_picks = 5
    cfg.process.min_required_sta = 3

    rng = np.random.default_rng(0)
    proj = Projection.from_center(cfg.region.center)
    n_sta, n_src, n_grids = cfg.graph.max_sta, cfg.graph.n_spatial_nodes, 2
    sta_cart = rng.uniform(-80e3, 80e3, (n_sta, 3)).astype(np.float32)
    sta_cart[:, 2] = rng.uniform(-1e3, 1e3, n_sta)
    sta_lla = np.asarray(proj.to_lla_np(sta_cart), np.float32)
    grids_cart = rng.uniform(-100e3, 100e3, (n_grids, n_src, 3)).astype(np.float32)
    grids_cart[:, :, 2] = rng.uniform(-35e3, 0, (n_grids, n_src))
    grids_lla = np.stack([np.asarray(proj.to_lla_np(g), np.float32) for g in grids_cart])
    tt = HomogeneousTravelTime(proj)
    trv_grids = np.stack([np.asarray(tt.from_cart(jnp.asarray(sta_cart), jnp.asarray(g)))
                          for g in grids_cart])
    ctx = build_domain_context(cfg, sta_lla, sta_cart, grids_lla, grids_cart, trv_grids)
    return cfg, ctx, tt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--n-sta", type=int, default=32)
    ap.add_argument("--n-src", type=int, default=200)
    ap.add_argument("--n-batch", type=int, default=8)
    ap.add_argument("--thresh", type=float, default=0.3)
    ap.add_argument("--eval-T", type=float, default=1800.0)
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--save-params", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from genie_tpu.models.detector import Detector
    from genie_tpu.train.trainer import init_train_state, make_train_step
    from genie_tpu.synth.generator import synthesize_timeline
    from genie_tpu.infer.pipeline import InferencePipeline
    from genie_tpu.calibration.corrections import matched_catalog_stats

    cfg, ctx, tt = build(args)
    model = Detector(src_chunk=16)
    key = jax.random.PRNGKey(0)
    state = init_train_state(model, cfg, ctx, tt.from_cart, key)
    step_fn, _ = make_train_step(model, cfg, ctx, tt.from_cart)

    t0 = time.time()
    for i in range(args.steps):
        key, k = jax.random.split(key)
        state, metrics = step_fn(state, k)
        if i % 50 == 0 or i == args.steps - 1:
            print(f"step {i} loss {float(metrics['loss']):.5f} "
                  f"trgts {np.asarray(metrics['trgts']).round(1)} "
                  f"preds {np.asarray(metrics['preds']).round(1)} "
                  f"({(time.time()-t0)/max(i,1):.2f}s/step)", flush=True)
    train_time = time.time() - t0
    if args.save_params:
        import pickle
        Path(args.save_params).write_bytes(
            pickle.dumps(jax.tree.map(np.asarray, state.params)))

    # --- evaluation timeline ---------------------------------------------
    ev_cfg = cfg.synth
    ev_cfg.T = args.eval_T
    tl = jax.jit(lambda k: synthesize_timeline(
        k, ev_cfg, ctx.sta_cart, tt.from_cart,
        ctx.scale_cart, ctx.offset_cart,
        (ctx.offset_cart[2], ctx.offset_cart[2] + ctx.scale_cart[2]),
        n_sta_real=ctx.sta_cart.shape[0]))(jax.random.PRNGKey(1234))
    pm = np.asarray(tl.pick_mask)
    pick_t = np.asarray(tl.pick_t)[pm]
    pick_sta = np.asarray(tl.pick_sta)[pm]
    pick_ph = np.asarray(tl.pick_phase)[pm].astype(np.float32)

    # ground truth: events with enough picks to be detectable
    ev_mask = np.asarray(tl.ev_mask)
    pe = np.asarray(tl.pick_event)[pm]
    n_picks_per_ev = np.bincount(pe[pe >= 0], minlength=len(ev_mask))
    uniq_sta = np.zeros(len(ev_mask))
    for e in np.unique(pe[pe >= 0]):
        uniq_sta[e] = len(np.unique(pick_sta[pe == e]))
    detectable = ev_mask & (n_picks_per_ev >= cfg.synth.min_pick_arrival) & \
        (uniq_sta >= cfg.synth.min_sta_arrival)
    true_srcs = np.concatenate(
        (np.asarray(tl.ev_pos_cart)[detectable],
         np.asarray(tl.ev_time)[detectable][:, None]), axis=1)

    t1 = time.time()
    pipe = InferencePipeline(model, state.params, cfg, ctx, tt.from_cart)
    events = pipe.process(pick_t, pick_sta, pick_ph, 0.0, args.eval_T)
    infer_time = time.time() - t1

    det_srcs = np.array([[*ev.pos_cart, ev.time] for ev in events]).reshape(-1, 4)
    stats = matched_catalog_stats(det_srcs, true_srcs, sig_x=25e3, sig_t=10.0)
    prec = stats["n_matched"] / max(stats["n_detected"], 1)
    rec = stats["detection_rate"]
    f1 = 2 * prec * rec / max(prec + rec, 1e-9)
    out = {
        "steps": args.steps, "train_s_per_step": train_time / args.steps,
        "infer_time_s": infer_time, "n_true": int(detectable.sum()),
        "n_detected": stats["n_detected"], "n_matched": stats["n_matched"],
        "precision": round(prec, 3), "recall": round(rec, 3), "f1": round(f1, 3),
        "median_epi_err_m": stats.get("residual_xy_mean"),
        "median_t_err_s": stats.get("residual_t_mean"),
    }
    print(json.dumps(out) if args.json else out, flush=True)


if __name__ == "__main__":
    main()
