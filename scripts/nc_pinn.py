#!/usr/bin/env python
"""Train the production NC travel-time PINN on the FMM tables.

Importance-sampled training mix (uniform, 1/t, 1/t², near-station — ref
calculate_travel_times_3D_train_model.py:414-551), held-out validation on
(a) unseen grid nodes of training stations and (b) entirely held-out
stations (the reference's NN-vs-fresh-FMM cross-validation, :1415-1534),
plus the velocity-recovery R² check (:1073-1246).

    python scripts/nc_pinn.py --steps 40000 --batch 16384
"""

import argparse
import pickle
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from nc_common import PROJECT_ROOT, nc_config, nc_projection


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40000)
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--per-sta", type=int, default=30000)
    ap.add_argument("--holdout-every", type=int, default=20)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default=str(PROJECT_ROOT / "Grids" / "pinn_nc.pkl"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from genie_tpu.models.travel_time_pinn import (
        TravelTimesPN, importance_sample_volume, make_pinn_loss,
        scales_from_domain, velocity_r2)

    cfg, sta_lla = nc_config()
    proj = nc_projection(cfg)
    sta_cart = np.asarray(proj.to_cart_np(sta_lla), np.float32)
    tt_dir = PROJECT_ROOT / "TravelTimeData"
    files = sorted(tt_dir.glob("travel_time_grid_station_*.npz"),
                   key=lambda f: int(f.stem.split("_")[-1]))
    assert len(files) == len(sta_cart), f"{len(files)} tables != {len(sta_cart)}"

    rng = np.random.default_rng(0)
    z0 = np.load(files[0])
    origin, h = z0["origin"], float(z0["h"])
    shape = z0["Tp"].shape
    extent = np.asarray(shape) * h
    center = origin + extent / 2
    L = float(extent.max())
    v_mean = [float(np.mean(cfg.velocity.vp)), float(np.mean(cfg.velocity.vs))]

    srcs, stas, ts = [], [], []
    v_srcs, v_stas, v_ts = [], [], []   # val: unseen nodes, train stations
    h_srcs, h_stas, h_ts = [], [], []   # val: held-out stations
    t_max = 0.0
    t0 = time.time()
    for j, f in enumerate(files):
        z = np.load(f)
        t_max = max(t_max, float(z["Ts"].max()))
        held = (j % args.holdout_every == 0)
        n = 4096 if held else args.per_sta + 2048
        src, t = importance_sample_volume(rng, z["Tp"], z["Ts"], z["origin"],
                                          float(z["h"]), sta_cart[j], n)
        if held:
            h_srcs.append(src)
            h_ts.append(t)
            h_stas.append(np.broadcast_to(sta_cart[j], (n, 3)))
        else:
            srcs.append(src[:args.per_sta])
            ts.append(t[:args.per_sta])
            stas.append(np.broadcast_to(sta_cart[j], (args.per_sta, 3)))
            v_srcs.append(src[args.per_sta:])
            v_ts.append(t[args.per_sta:])
            v_stas.append(np.broadcast_to(sta_cart[j], (2048, 3)))
        if j % 50 == 0:
            print(f"sampled station {j} ({time.time()-t0:.0f}s)", flush=True)

    scales = scales_from_domain(center, L, t_max, v_mean)
    tau = float(scales.t_scale)

    def norm_x(x):
        return (np.asarray(x) - center) / L

    bank = {
        "sta": jnp.asarray(norm_x(np.concatenate(stas)), jnp.float32),
        "src": jnp.asarray(norm_x(np.concatenate(srcs)), jnp.float32),
        "t": jnp.asarray(np.concatenate(ts) / tau, jnp.float32),
    }
    n_bank = bank["t"].shape[0]
    print(f"bank {n_bank/1e6:.1f}M samples; t_max {t_max:.1f}s; "
          f"L {L/1e3:.0f} km", flush=True)

    # NOTE: the bank must be a runtime argument of the jitted step, not a
    # closure capture — closed-over concrete arrays are embedded as program
    # constants, and a ~350 MB program body overflows the remote-compile
    # transport (HTTP 413) on the tunneled TPU.

    # velocity damping toward the 1-D profile (normalized units)
    depths = jnp.asarray(cfg.velocity.depths, jnp.float32)
    vp_prof = jnp.asarray(cfg.velocity.vp, jnp.float32)
    vs_prof = jnp.asarray(cfg.velocity.vs, jnp.float32)

    def v_init_fn(src_n):
        z_phys = src_n[:, 2] * L + center[2]
        vp = jnp.interp(z_phys, depths, vp_prof)
        vs = jnp.interp(z_phys, depths, vs_prof)
        return jnp.stack((vp, vs), axis=1) * tau / L

    model = TravelTimesPN()
    params = jax.jit(model.init, static_argnames="method")(
        jax.random.PRNGKey(0), jnp.zeros((1, 3)),
        jnp.zeros((1, 3)), scales.conversion_factor,
        scales.v_mean, scales.t_scale,
        method=TravelTimesPN.init_all)
    loss_fn = make_pinn_loss(model, scales, v_init_fn=v_init_fn)
    sched = optax.cosine_decay_schedule(args.lr, args.steps, alpha=0.02)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, k, bank):
        ks, kl = jax.random.split(k)
        i = jax.random.randint(ks, (args.batch,), 0, n_bank)
        sta_n, src_n, t_obs_n = bank["sta"][i], bank["src"][i], bank["t"][i]
        (total, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, sta_n, src_n, t_obs_n, kl)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, total, parts

    key = jax.random.PRNGKey(1)
    t0 = time.time()
    for i in range(args.steps):
        key, k = jax.random.split(key)
        params, opt_state, total, parts = step(params, opt_state, k, bank)
        if i % 1000 == 0 or i == args.steps - 1:
            print(f"pinn step {i} loss {float(total):.5f} "
                  f"data {float(parts['data']):.5f} pde {float(parts['pde']):.5f} "
                  f"({(time.time()-t0)/max(i,1)*1e3:.1f} ms/step)", flush=True)

    # ---- validation -------------------------------------------------------
    @jax.jit
    def predict(sta_n, src_n):
        return model.apply(params, sta_n, src_n, scales.conversion_factor,
                           scales.v_mean, scales.t_scale)

    def eval_set(stas_l, srcs_l, ts_l, label):
        sta_n = jnp.asarray(norm_x(np.concatenate(stas_l)), jnp.float32)
        src_n = jnp.asarray(norm_x(np.concatenate(srcs_l)), jnp.float32)
        t_true = np.concatenate(ts_l)
        err = np.abs(np.asarray(predict(sta_n, src_n)) - t_true)
        stats = {"median_s": float(np.median(err)),
                 "p90_s": float(np.percentile(err, 90)),
                 "p99_s": float(np.percentile(err, 99))}
        print(f"{label}: median |dt| {stats['median_s']:.3f}s "
              f"p90 {stats['p90_s']:.3f}s p99 {stats['p99_s']:.3f}s", flush=True)
        return stats

    val = eval_set(v_stas, v_srcs, v_ts, "val (train stations, unseen nodes)")
    xval = eval_set(h_stas, h_srcs, h_ts,
                    f"cross-val ({len(h_stas)} held-out stations)")

    # R² samples must stay inside the FMM volume's depth extent — the
    # velocity head is unconstrained outside it (z normalized by the
    # *horizontal* scale L spans far beyond the ~50 km deep volume)
    src_r2 = rng.uniform(-0.5, 0.5, (20000, 3)).astype(np.float32)
    zn = (origin[2] - center[2]) / L, (origin[2] + extent[2] - center[2]) / L
    src_r2[:, 2] = rng.uniform(zn[0], zn[1], 20000).astype(np.float32)
    z_phys = src_r2[:, 2] * L + center[2]
    v_true = np.stack((np.interp(z_phys, cfg.velocity.depths, cfg.velocity.vp),
                       np.interp(z_phys, cfg.velocity.depths, cfg.velocity.vs)),
                      axis=1)
    r2 = velocity_r2(model, params, scales, src_r2, v_true)
    print(f"velocity recovery R²: Vp {r2[0]:.4f} Vs {r2[1]:.4f}", flush=True)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_bytes(pickle.dumps({
        "params": jax.tree.map(np.asarray, params),
        "scales": {k: np.asarray(v) for k, v in scales._asdict().items()},
        "metrics": {"val": val, "cross_val": xval,
                    "velocity_r2": np.asarray(r2).tolist()},
    }))
    print(f"saved {out}", flush=True)


if __name__ == "__main__":
    main()
