#!/usr/bin/env python
"""Travel-time engine CLI — ``calculate_travel_times_3D_build_data.py`` (FMM
tables, job-shardable) and ``..._train_model.py`` (PINN fit) combined.

    # build FMM tables (optionally sharded: --job i --n-jobs N)
    python scripts/calculate_travel_times.py <root> build [--job 0 --n-jobs 1]
    # train the physics-informed surrogate on the tables
    python scripts/calculate_travel_times.py <root> train [--steps 20000]
"""

import argparse
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("mode", choices=["build", "train"])
    ap.add_argument("--config", default=None)
    ap.add_argument("--job", type=int, default=0)
    ap.add_argument("--n-jobs", type=int, default=1)
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--batch", type=int, default=4096)
    args = ap.parse_args()

    from genie_tpu.config import load_config
    from genie_tpu.setup.project import load_project
    from genie_tpu.workflow import build_fmm_tables

    cfg = load_config(args.config)
    pj = load_project(args.root, cfg.region.name)
    proj = pj["projection"]
    sta_lla = np.asarray(pj["sta_lla"], float)
    tt_dir = Path(args.root) / "TravelTimeData"

    if args.mode == "build":
        idxs = [j for j in range(len(sta_lla)) if j % args.n_jobs == args.job]
        build_fmm_tables(cfg, proj, sta_lla, tt_dir, station_indices=idxs)
        return

    # train: sample (station, source, time) tuples from the FMM volumes
    import jax
    import jax.numpy as jnp
    from genie_tpu.models.travel_time_pinn import (
        TravelTimesPN, scales_from_domain, train_pinn)

    files = sorted(tt_dir.glob("travel_time_grid_station_*.npz"))
    if not files:
        raise SystemExit("no FMM tables; run 'build' first")
    vols = [np.load(f) for f in files]
    sta_idx = [int(f.stem.split("_")[-1]) for f in files]
    sta_cart = np.asarray(proj.to_cart_np(sta_lla), np.float32)
    origin = vols[0]["origin"]
    h = float(vols[0]["h"])
    shape = vols[0]["Tp"].shape
    extent = np.asarray(shape) * h
    center = origin + extent / 2
    L = float(extent.max())
    t_max = max(float(v["Ts"].max()) for v in vols)
    v_mean = [float(np.mean(cfg.velocity.vp)), float(np.mean(cfg.velocity.vs))]
    scales = scales_from_domain(center, L, t_max, v_mean)

    Tp = np.stack([v["Tp"] for v in vols])
    Ts = np.stack([v["Ts"] for v in vols])
    Tp_j = jnp.asarray(Tp)
    Ts_j = jnp.asarray(Ts)
    sta_n = jnp.asarray((sta_cart[sta_idx] - center) / L)

    def sample_fn(key, n):
        k1, k2 = jax.random.split(key)
        si = jax.random.randint(k1, (n,), 0, len(files))
        ijk = jax.random.randint(k2, (n, 3), 0, jnp.asarray(shape))
        tp = Tp_j[si, ijk[:, 0], ijk[:, 1], ijk[:, 2]]
        ts = Ts_j[si, ijk[:, 0], ijk[:, 1], ijk[:, 2]]
        src = (jnp.asarray(origin) + ijk * h - center) / L
        t = jnp.stack((tp, ts), axis=1) / scales.t_scale
        return sta_n[si], src, t

    model = TravelTimesPN()
    params = train_pinn(jax.random.PRNGKey(0), model, scales, sample_fn,
                        n_steps=args.steps, batch=args.batch, log_every=500)
    out = Path(args.root) / "Grids" / "travel_time_neural_network_physics_informed_p_s_ver_1.pkl"
    out.write_bytes(pickle.dumps({
        "params": params,
        "scales": {k: np.asarray(v) for k, v in scales._asdict().items()},
    }))
    print(f"saved PINN to {out}")


if __name__ == "__main__":
    main()
