#!/usr/bin/env python
"""Microbenchmark of sweep featurizer formulations on the real NC domain
(nc_sweep_stages.py showed featurization = 98% of the sweep batch):

  * searchsorted (training/inference default `featurize_window`)
  * rasterized scatter+gather (`featurize_window_rasterized`)
  * rasterized scatter + one-hot MXU matmul gather (constant travel-time
    bin one-hot per grid — the gather becomes a batched bf16 matmul)

Also reports max feature deviation of each vs the searchsorted reference
(bin quantization at dt = sigma/10).

    python scripts/nc_featurize_bench.py --run projects/NC_EHZ/run6
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
    ap.add_argument("--n-batches", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from genie_tpu.infer.pipeline import InferencePipeline
    from genie_tpu.models.detector import Detector
    from genie_tpu.synth.generator import (featurize_window,
                                           featurize_window_rasterized)

    run_dir = Path(args.run)
    blob = pickle.loads((run_dir / "params.pkl").read_bytes())
    params = blob["params"] if isinstance(blob, dict) and "params" in blob else blob
    cfg, ctx, proj, trv, sta_lla = build_runtime(run_dir, n_query=10000)
    pick_t, pick_sta, pick_ph, prob, sta_ind, _, _ = load_day(args.day)[:7]
    keep = prob >= 0.3
    pick_t, pick_sta, pick_ph = pick_t[keep], pick_sta[keep], pick_ph[keep]

    model = Detector(src_chunk=16, via_matmul=True,
                     scale_rel=cfg.model.scale_rel,
                     kernel_sig_t=cfg.model.kernel_sig_t)
    pipe = InferencePipeline(model, params, cfg, ctx, trv.from_cart,
                             verbose=False, sweep_half=True)
    pipe.set_station_mask(sta_ind)

    max_t = float(np.max(np.asarray(ctx.trv_grids)))
    t_lo, t_hi = -10.0, cfg.model.t_win + max_t + 10.0
    sig = float(cfg.train.src_t_kernel)
    dt = sig / 10.0
    n_bins = int(np.ceil((t_hi - t_lo) / dt)) + 1
    trv_g = ctx.trv_grids[0]
    n_src, n_sta = trv_g.shape[:2]
    print(f"max_t {max_t:.1f}s -> {n_bins} bins, grid {n_src}x{n_sta}")

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

    # constant one-hot gather tables for grid 0 (built once, device-resident)
    idx_p = np.clip(np.round((np.asarray(trv_g[:, :, 0]) - t_lo) / dt), 0,
                    n_bins - 1).astype(np.int32)                 # (n_src, n_sta)
    idx_s = np.clip(np.round((np.asarray(trv_g[:, :, 1]) - t_lo) / dt), 0,
                    n_bins - 1).astype(np.int32)

    def onehot(idx):  # (n_sta, n_bins, n_src) bf16
        g = np.zeros((n_sta, n_bins, n_src), np.float32)
        g[np.arange(n_sta)[None, :], idx, np.arange(n_src)[:, None]] = 1.0
        return jnp.asarray(g, jnp.bfloat16)

    G_p, G_s = onehot(idx_p), onehot(idx_s)
    print(f"one-hot tables: 2 x {G_p.size * 2 / 1e6:.0f} MB bf16")

    w_half = 50
    offs = jnp.arange(-w_half, w_half + 1)

    def rasterize(tp, ip, valid):
        centers = jnp.round((tp - t_lo) / dt).astype(jnp.int32)
        bins = centers[:, None] + offs[None, :]
        t_bin = t_lo + bins * dt
        vals = jnp.exp(-0.5 * ((t_bin - tp[:, None]) / sig) ** 2)
        ok = valid[:, None] & (bins >= 0) & (bins < n_bins)
        flat = jnp.where(ok, ip[:, None] * n_bins + bins, 0)
        vals = jnp.where(ok, vals, 0.0)
        return jnp.zeros(n_sta * n_bins).at[flat.ravel()].max(
            vals.ravel()).reshape(n_sta, n_bins)

    def feat_matmul(tp, ip, ph, pm, sm):
        s_any = rasterize(tp, ip, pm)
        s_p = rasterize(tp, ip, pm & (ph[:, 0] < 0.5))
        s_s = rasterize(tp, ip, pm & (ph[:, 0] > 0.5))
        S = jnp.stack((s_any, s_p, s_s)).astype(jnp.bfloat16)  # (3, n_sta, n_bins)

        def g(G, S1):  # (n_sta, n_bins, n_src) x (n_sta, n_bins) -> (n_src, n_sta)
            return jnp.einsum("abn,ab->na", G, S1,
                              preferred_element_type=jnp.float32)

        feat = jnp.stack((g(G_p, S[0]), g(G_s, S[0]),
                          g(G_p, S[1]), g(G_s, S[2])), axis=-1)
        feat = feat * sm[None, :, None]
        return feat.astype(jnp.bfloat16).sum()

    def feat_ss(tp, ip, ph, pm, sm):
        f, m = featurize_window(tp, ip, ph, pm, trv_g, sig, sm)
        return f.astype(jnp.bfloat16).sum()

    def feat_rast(tp, ip, ph, pm, sm):
        f, m = featurize_window_rasterized(tp, ip, ph, pm, trv_g, sig, sm,
                                           t_lo, t_hi)
        return f.astype(jnp.bfloat16).sum()

    fns = {
        "searchsorted (current)": jax.jit(jax.vmap(
            feat_ss, in_axes=(0, 0, 0, 0, None))),
        "rasterized scatter+gather": jax.jit(jax.vmap(
            feat_rast, in_axes=(0, 0, 0, 0, None))),
        "rasterized + one-hot matmul": jax.jit(jax.vmap(
            feat_matmul, in_axes=(0, 0, 0, 0, None))),
    }
    for name, fn in fns.items():
        np.asarray(fn(*batches[0][:4], pipe.sta_mask))
        t0 = time.time()
        for b in batches:
            np.asarray(fn(*b[:4], pipe.sta_mask))
        dtb = (time.time() - t0) / len(batches)
        print(f"{name:30s} {dtb:7.4f} s/batch", flush=True)

    # value agreement on one window
    tp, ip, ph, pm = (b[0][0] for b in [batches[0]] for _ in [0]), None, None, None
    tp, ip, ph, pm = (batches[0][k][0] for k in range(4))
    f_ref, _ = featurize_window(tp, ip, ph, pm, trv_g, sig, pipe.sta_mask)
    f_r, _ = featurize_window_rasterized(tp, ip, ph, pm, trv_g, sig,
                                         pipe.sta_mask, t_lo, t_hi)
    s_any = rasterize(tp, ip, pm)
    s_p = rasterize(tp, ip, pm & (ph[:, 0] < 0.5))
    s_s = rasterize(tp, ip, pm & (ph[:, 0] > 0.5))
    def gather_mm(G, S1):
        return jnp.einsum("abn,ab->na", G.astype(jnp.float32), S1)
    f_m = jnp.stack((gather_mm(G_p, s_any), gather_mm(G_s, s_any),
                     gather_mm(G_p, s_p), gather_mm(G_s, s_s)), axis=-1)
    f_m = f_m * pipe.sta_mask[None, :, None]
    print(f"max|rasterized - searchsorted| = "
          f"{float(jnp.max(jnp.abs(f_r - f_ref))):.4f}")
    print(f"max|matmul - rasterized|       = "
          f"{float(jnp.max(jnp.abs(f_m - f_r))):.4f}")


if __name__ == "__main__":
    main()
