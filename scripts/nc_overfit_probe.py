#!/usr/bin/env python
"""Single-batch overfit probe for the NC detection heads.

The run2/run3 failure mode is a grid detection head whose predictions stay
at ~0.01/window while association heads converge. This probe separates
"structural bug (labels don't correlate with features)" from "training
signal too weak (budget/weighting)":

  1. builds the exact NC training context of scripts/nc_train.py;
  2. generates ONE fixed synthetic batch and reports, per window, the
     input-feature contrast at the labeled grid cells vs background —
     if the contrast is ~0 the featurization and the labels disagree and
     no amount of training can work;
  3. Adam-overfits the model on that single fixed batch and logs the
     grid/query head losses and pred-vs-label maxima. A healthy
     architecture drives the grid loss to ~0 within a few hundred steps
     (it can memorize 8 windows); a structural bug cannot.

Usage: python scripts/nc_overfit_probe.py --steps 1500 [--boost 30]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from nc_common import PROJECT_ROOT, nc_config, nc_projection
from nc_train import build_grids, interp_fmm_at, load_subnetworks, make_trv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--boost", type=float, default=30.0)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--n-src", type=int, default=500)
    ap.add_argument("--n-grids", type=int, default=1)
    ap.add_argument("--trv", choices=["homog", "pinn"], default="pinn")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from genie_tpu.models.detector import Detector
    from genie_tpu.train.trainer import (TrainState, build_domain_context,
                                         init_train_state, loss_fn,
                                         make_generate_batch)

    cfg, sta_lla = nc_config(n_src=args.n_src, n_grids=args.n_grids, n_batch=8)
    cfg.train.positive_boost = args.boost
    proj = nc_projection(cfg)
    sta_cart = np.asarray(proj.to_cart_np(sta_lla), np.float32)
    trv = make_trv(args, cfg, proj)

    grids_lla, grids_cart = build_grids(
        cfg, proj, args.n_grids, args.n_src,
        PROJECT_ROOT / "Grids" / f"grids_{args.n_src}.npz")
    tt_dir = PROJECT_ROOT / "TravelTimeData"
    tg_cache = PROJECT_ROOT / "Grids" / f"trv_grids_{args.n_src}_5_fmm.npy"
    if tg_cache.exists():
        trv_grids = np.load(tg_cache)[:args.n_grids]
    elif (tt_dir / "travel_time_grid_station_0.npz").exists():
        trv_grids = np.stack([
            interp_fmm_at(grids_cart[g], tt_dir, len(sta_cart))
            for g in range(args.n_grids)])
    else:
        trv_grids = np.stack([
            np.asarray(trv.from_cart(jnp.asarray(sta_cart), jnp.asarray(g)))
            for g in grids_cart])

    subnets = load_subnetworks(len(sta_cart))
    ctx = build_domain_context(cfg, sta_lla.astype(np.float32), sta_cart,
                               grids_lla.astype(np.float32), grids_cart,
                               trv_grids, subnetworks=subnets)

    model = Detector(src_chunk=16, normalize_readin=cfg.model.normalize_readin)
    key = jax.random.PRNGKey(args.seed)
    state = init_train_state(model, cfg, ctx, trv.from_cart, key)

    # --- the one fixed batch -------------------------------------------
    wb = make_generate_batch(cfg, ctx, trv.from_cart)(jax.random.fold_in(key, 1))
    wb = jax.tree.map(lambda a: np.asarray(a), wb)

    # --- diagnostic 2: input contrast at labeled cells ------------------
    print("=== feature/label contrast per window ===")
    for b in range(wb.lbl_grid.shape[0]):
        lbl = wb.lbl_grid[b]                       # (n_src, n_t)
        node_lbl = lbl.max(axis=1)                 # (n_src,)
        # read-in style per-node input energy: sum over stations of feat
        energy = (wb.feat[b] * wb.mask[b]).sum(axis=(1, 2))   # (n_src,)
        if node_lbl.max() < 0.1:
            print(f"  w{b}: no active event (lbl max {node_lbl.max():.3f}), "
                  f"bg energy median {np.median(energy):.2f}")
            continue
        hot = node_lbl > 0.5 * node_lbl.max()
        r = np.corrcoef(node_lbl, energy)[0, 1]
        print(f"  w{b}: lbl max {node_lbl.max():.3f} at node {node_lbl.argmax()}, "
              f"hot-cell energy {energy[hot].mean():.2f} vs bg "
              f"{np.median(energy[~hot]):.2f} (corr {r:.3f}, "
              f"picks {int(wb.pick_mask[b].sum())})")

    # --- diagnostic 3: single-batch overfit -----------------------------
    wb_dev = jax.tree.map(jnp.asarray, wb)
    optimizer = optax.adam(args.lr)
    opt_state = optimizer.init(state.params)
    state = TrainState(state.params, opt_state, state.step)

    @jax.jit
    def step_fn(st: TrainState):
        def loss(p):
            return loss_fn(model, p, ctx, cfg, wb_dev, trv.from_cart)
        (total, (parts, trgts, preds)), grads = jax.value_and_grad(
            loss, has_aux=True)(st.params)
        updates, opt_state = optimizer.update(grads, st.opt_state, st.params)
        params = optax.apply_updates(st.params, updates)
        return TrainState(params, opt_state, st.step + 1), total, parts, trgts, preds

    print("=== single-batch overfit ===")
    t0 = time.time()
    for i in range(args.steps):
        state, total, parts, trgts, preds = step_fn(state)
        if i % 100 == 0 or i == args.steps - 1:
            parts = np.asarray(parts)
            print(f"step {i} loss {float(total):.5f} "
                  f"[grid {parts[0]:.5f} query {parts[1]:.5f} "
                  f"p {parts[2]:.5f} s {parts[3]:.5f}] "
                  f"trgts {np.asarray(trgts).round(1)} "
                  f"preds {np.asarray(preds).round(1)} "
                  f"({(time.time()-t0)/max(i,1):.2f}s/step)", flush=True)


if __name__ == "__main__":
    main()
