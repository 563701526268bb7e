#!/usr/bin/env python
"""NC (BSSA benchmark) detector training at full 374-station scale.

    python scripts/nc_train.py --steps 15000 --trv pinn --boost 30 \
        --out projects/NC_EHZ/run1

Grids are kmeans-packed once and cached in the project dir so training and
inference share them. Real per-day station subsets (``sta_ind_use`` of the
100 BSSA pick days) are used as training subnetworks (ref
train_GENIE_model.py:910-935 fixed_subnetworks).
"""

import argparse
import pickle
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from nc_common import PROJECT_ROOT, list_days, load_day, nc_config, nc_projection


def build_grids(cfg, proj, n_grids, n_src, cache: Path):
    """kmeans-packed source grids, cached (lla + cart)."""
    import jax
    from genie_tpu.graphs.build import kmeans_packing

    if cache.exists():
        z = np.load(cache)
        if z["grids_lla"].shape[0] >= n_grids and z["grids_lla"].shape[1] == n_src:
            return z["grids_lla"][:n_grids], z["grids_cart"][:n_grids]
    scale, offset = cfg.region.scale_offset(extend=True)
    key = jax.random.PRNGKey(7)
    grids_lla = []
    for g in range(n_grids):
        key, k = jax.random.split(key)
        v = kmeans_packing(k, np.asarray(scale), np.asarray(offset), n_src,
                           proj.to_cart, weight=np.array([1.0, 1.0, 2.5]),
                           n_steps=300)
        grids_lla.append(np.asarray(v))
    grids_lla = np.stack(grids_lla)
    grids_cart = np.stack([np.asarray(proj.to_cart_np(g), np.float32)
                           for g in grids_lla])
    cache.parent.mkdir(parents=True, exist_ok=True)
    np.savez(cache, grids_lla=grids_lla, grids_cart=grids_cart)
    return grids_lla, grids_cart


def interp_fmm_at(points_cart, tt_dir: Path, n_sta):
    """Exact trilinear interpolation of the FMM volumes at arbitrary points:
    (n_pts, n_sta, 2). Host-side (used for the precomputed trv_grids).

    Pass the points of ALL grids concatenated: decompressing each station
    volume dominates, so one call over 2500 points costs the same as one
    call over 500."""
    from scipy.interpolate import RegularGridInterpolator

    points_cart = np.asarray(points_cart, np.float64)
    out = np.zeros((points_cart.shape[0], n_sta, 2), np.float32)
    for j in range(n_sta):
        z = np.load(tt_dir / f"travel_time_grid_station_{j}.npz")
        origin, h = z["origin"], float(z["h"])
        axes = [origin[i] + np.arange(z["Tp"].shape[i]) * h for i in range(3)]
        p = np.clip(points_cart, [a[0] for a in axes], [a[-1] for a in axes])
        for ph, name in enumerate(("Tp", "Ts")):
            f = RegularGridInterpolator(axes, z[name])
            out[:, j, ph] = f(p)
    return out


def load_subnetworks(n_sta):
    subs = []
    for day in list_days():
        try:
            *_, ind_use, _, _ = load_day(day)
        except Exception:
            continue
        m = np.zeros(n_sta, bool)
        m[ind_use] = True
        subs.append(m)
    return np.stack(subs) if subs else None


def make_trv(args, cfg, proj):
    from genie_tpu.models.travel_time import HomogeneousTravelTime

    if args.trv == "homog":
        return HomogeneousTravelTime(proj, vp=6000.0, vs=6000.0 / 1.73)
    from genie_tpu.workflow import make_trv as _make_trv

    pinn_path = PROJECT_ROOT / "Grids" / "pinn_nc.pkl"
    trv = _make_trv(cfg, proj, pinn_path=pinn_path)
    if type(trv).__name__ == "HomogeneousTravelTime":
        raise SystemExit(f"no PINN at {pinn_path}; run nc_pinn.py first")
    return trv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=15000)
    ap.add_argument("--n-src", type=int, default=500)
    ap.add_argument("--n-grids", type=int, default=5)
    ap.add_argument("--n-batch", type=int, default=8)
    ap.add_argument("--boost", type=float, default=0.0)
    ap.add_argument("--loss-weights", type=float, nargs=4, default=None,
                    help="override the 4 output loss weights (grid, query, "
                         "P assoc, S assoc); default = reference "
                         "[0.1, 0.4, 0.25, 0.25]")
    ap.add_argument("--trv", choices=["homog", "pinn"], default="pinn")
    ap.add_argument("--trv-grids", choices=["fmm", "trv"], default=None,
                    help="source of precomputed grid travel times "
                         "(default: fmm when tables exist)")
    ap.add_argument("--out", default=str(PROJECT_ROOT / "run1"))
    ap.add_argument("--restart", action="store_true")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--log-every", type=int, default=100)
    ap.add_argument("--ckpt-every", type=int, default=500)
    ap.add_argument("--no-subnetworks", action="store_true")
    ap.add_argument("--readin-norm", type=int, default=0,
                    help="count-normalize the bipartite read-in station sum. "
                         "Default 0 = the reference's raw sum: the station "
                         "COUNT of coherent picks is the detection signal, "
                         "and normalizing it away collapsed the detection "
                         "heads to an input-independent background (run2)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from genie_tpu.models.detector import Detector
    from genie_tpu.train.trainer import (build_domain_context, init_train_state,
                                         make_train_step, TrainState)

    cfg, sta_lla = nc_config(n_src=args.n_src, n_grids=args.n_grids,
                             n_batch=args.n_batch)
    cfg.model.normalize_readin = bool(args.readin_norm)
    cfg.train.positive_boost = args.boost
    cfg.train.lr = args.lr
    if args.loss_weights is not None:
        cfg.train.loss_weights = tuple(args.loss_weights)
    proj = nc_projection(cfg)
    sta_cart = np.asarray(proj.to_cart_np(sta_lla), np.float32)
    trv = make_trv(args, cfg, proj)

    grids_lla, grids_cart = build_grids(
        cfg, proj, args.n_grids, args.n_src,
        PROJECT_ROOT / "Grids" / f"grids_{args.n_src}.npz")

    tt_dir = PROJECT_ROOT / "TravelTimeData"
    use_fmm = (args.trv_grids or
               ("fmm" if (tt_dir / "travel_time_grid_station_0.npz").exists()
                else "trv")) == "fmm"
    tg_cache = PROJECT_ROOT / "Grids" / f"trv_grids_{args.n_src}_{args.n_grids}_{'fmm' if use_fmm else args.trv}.npy"
    if tg_cache.exists():
        trv_grids = np.load(tg_cache)
    elif use_fmm:
        print("interpolating FMM volumes at grid nodes...", flush=True)
        ng, ns = grids_cart.shape[:2]
        trv_grids = interp_fmm_at(grids_cart.reshape(-1, 3), tt_dir,
                                  len(sta_cart)).reshape(ng, ns, len(sta_cart), 2)
        np.save(tg_cache, trv_grids)
    else:
        trv_grids = np.stack([
            np.asarray(trv.from_cart(jnp.asarray(sta_cart), jnp.asarray(g)))
            for g in grids_cart])
        np.save(tg_cache, trv_grids)

    subnets = None if args.no_subnetworks else load_subnetworks(len(sta_cart))
    if subnets is not None:
        print(f"{subnets.shape[0]} observed subnetworks "
              f"(median {int(np.median(subnets.sum(1)))} stations)", flush=True)

    ctx = build_domain_context(cfg, sta_lla.astype(np.float32), sta_cart,
                               grids_lla.astype(np.float32), grids_cart,
                               trv_grids, subnetworks=subnets)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    cfg.save(out / "config.yaml")
    model = Detector(src_chunk=16, normalize_readin=cfg.model.normalize_readin)
    key = jax.random.PRNGKey(0)
    state = init_train_state(model, cfg, ctx, trv.from_cart, key)
    start = 0
    ckpt = out / "params.pkl"
    if args.restart and ckpt.exists():
        blob = pickle.loads(ckpt.read_bytes())
        state = TrainState(jax.tree.map(jnp.asarray, blob["params"]),
                           state.opt_state, jnp.asarray(blob["step"]))
        if "opt_state" in blob:
            state = state._replace(opt_state=jax.tree.map(
                jnp.asarray, blob["opt_state"]))
        start = int(blob["step"])
        key = jax.random.fold_in(key, start)
        print(f"restarted at step {start}", flush=True)

    step_fn, _ = make_train_step(model, cfg, ctx, trv.from_cart)
    log = open(out / "train_log.txt", "a")
    t0 = time.time()
    for i in range(start, args.steps):
        key, k = jax.random.split(key)
        state, metrics = step_fn(state, k)
        if i % args.log_every == 0 or i == args.steps - 1:
            line = (f"step {i} loss {float(metrics['loss']):.5f} "
                    f"[g {float(metrics['loss_grid']):.5f} "
                    f"q {float(metrics['loss_query']):.5f} "
                    f"p {float(metrics['loss_p']):.5f} "
                    f"s {float(metrics['loss_s']):.5f}] "
                    f"trgts {np.asarray(metrics['trgts']).round(1)} "
                    f"preds {np.asarray(metrics['preds']).round(1)} "
                    f"({(time.time() - t0) / max(i - start, 1):.2f}s/step)")
            print(line, flush=True)
            log.write(line + "\n")
            log.flush()
        if (i + 1) % args.ckpt_every == 0 or i == args.steps - 1:
            # atomic: a watchdog SIGKILL mid-write must never truncate the
            # only checkpoint — write a temp in the same dir, then replace
            tmp = ckpt.with_suffix(".pkl.tmp")
            tmp.write_bytes(pickle.dumps({
                "params": jax.tree.map(np.asarray, state.params),
                "opt_state": jax.tree.map(
                    lambda a: np.asarray(a) if hasattr(a, "dtype") else a,
                    state.opt_state),
                "step": i + 1}))
            tmp.replace(ckpt)
    print("done", flush=True)


if __name__ == "__main__":
    main()
