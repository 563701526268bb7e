#!/usr/bin/env python
"""BSSA real-data benchmark: the reference's "100 continuous days" test.

Builds a project for the NC (northern California) EHZ network shipped with
the reference's BSSA datasets, trains the detector on synthetic picks for
that network, processes real PhaseNet pick days, and scores against both the
USGS M>1 catalog (``cat``) and the reference GENIE's own detections
(``srcs_trv``/``izmatch``) — the parity metric of BASELINE.md.

    python scripts/bssa_benchmark.py --steps 6000 --days 2017_274 [--json]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

BSSA = Path("/root/reference/BSSA")
DAYS_DIR = BSSA / "Datasets" / "100 continuous days test"


def load_network():
    z = np.load(BSSA / "NC_EHZ_network.npz", allow_pickle=True)
    return z["locs"], z["stas"]


def load_day(day: str):
    """Returns (pick_t s, pick_sta global idx, pick_phase, pick_prob,
    sta_ind_use, cat, ref_srcs_trv)."""
    import h5py

    p = np.load(DAYS_DIR / "Picks" / f"{day}_NC_EHZ_picks_ver_1.npz",
                allow_pickle=True)
    P = p["P"]
    pick_t = P[:, 0] / 100.0  # 100 Hz sample index → seconds
    pick_sta = P[:, 1].astype(np.int64)
    pick_phase = P[:, 2].astype(np.float32)
    prob = P[:, 3]
    sta_ind_use = p["sta_ind_use"].astype(np.int64)

    y, d = day.split("_")
    src_file = DAYS_DIR / "Sources" / f"{day}_NC_EHZ_sources_ver_1.hdf5"
    cat = srcs_trv = None
    with h5py.File(src_file, "r") as f:
        for k in f.keys():
            if k.endswith("_cat"):
                cat = np.asarray(f[k])
            if k.endswith("_srcs_trv"):
                srcs_trv = np.asarray(f[k])
    return pick_t, pick_sta, pick_phase, prob, sta_ind_use, cat, srcs_trv


def build_domain(args, sta_lla):
    import jax.numpy as jnp
    import jax
    from genie_tpu.config import Config
    from genie_tpu.geometry import Projection
    from genie_tpu.graphs.build import kmeans_packing
    from genie_tpu.models.travel_time import HomogeneousTravelTime
    from genie_tpu.train.trainer import build_domain_context

    cfg = Config()
    cfg.region.name = "NC_EHZ"
    cfg.region.lat_range = (float(sta_lla[:, 0].min()), float(sta_lla[:, 0].max()))
    cfg.region.lon_range = (float(sta_lla[:, 1].min()), float(sta_lla[:, 1].max()))
    cfg.region.depth_range = (-40e3, 2e3)
    cfg.graph.max_sta = sta_lla.shape[0]
    cfg.graph.n_spatial_nodes = args.n_src
    cfg.graph.n_grids = args.n_grids
    cfg.graph.max_picks = args.max_picks
    cfg.train.n_batch = args.n_batch
    cfg.train.n_spc_query = 2000
    cfg.train.n_src_query = 96
    cfg.synth.max_events = 96
    cfg.synth.n_false_max = 2048
    cfg.synth.T = 3600.0
    cfg.synth.max_rate_events = 40.0
    cfg.synth.dist_range = (15e3, 350e3)
    cfg.process.thresh = args.thresh
    cfg.process.thresh_assoc = args.thresh
    cfg.process.min_required_picks = 6
    cfg.process.min_required_sta = 4
    cfg.process.step_size = args.step_size
    cfg.train.sequential_windows = True  # 374-station × 500-node scale

    proj = Projection.from_center(cfg.region.center)
    sta_cart = np.asarray(proj.to_cart_np(sta_lla), np.float32)
    tt = HomogeneousTravelTime(proj, vp=6000.0, vs=6000.0 / 1.73)

    scale, offset = cfg.region.scale_offset(extend=True)
    key = jax.random.PRNGKey(0)
    grids_lla = []
    for g in range(cfg.graph.n_grids):
        key, k = jax.random.split(key)
        v = kmeans_packing(k, np.asarray(scale), np.asarray(offset),
                           cfg.graph.n_spatial_nodes, proj.to_cart,
                           weight=np.array([1.0, 1.0, 2.5]), n_steps=300)
        grids_lla.append(np.asarray(v))
    grids_lla = np.stack(grids_lla)
    grids_cart = np.stack([np.asarray(proj.to_cart_np(g), np.float32)
                           for g in grids_lla])
    trv_grids = np.stack([
        np.asarray(tt.from_cart(jnp.asarray(sta_cart), jnp.asarray(g)))
        for g in grids_cart
    ])
    ctx = build_domain_context(cfg, sta_lla.astype(np.float32), sta_cart,
                               grids_lla.astype(np.float32), grids_cart, trv_grids)
    return cfg, ctx, proj, tt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--days", nargs="+", default=["2017_274"])
    ap.add_argument("--n-src", type=int, default=500)
    ap.add_argument("--n-grids", type=int, default=2)
    ap.add_argument("--n-batch", type=int, default=8)
    ap.add_argument("--max-picks", type=int, default=512)
    ap.add_argument("--thresh", type=float, default=0.25)
    ap.add_argument("--step-size", type=float, default=1.0)
    ap.add_argument("--min-prob", type=float, default=0.3)
    ap.add_argument("--t-end", type=float, default=86400.0)
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--save-params", default="/tmp/bssa_params.pkl")
    ap.add_argument("--load-params", default=None,
                    help="skip training, load params pickle")
    args = ap.parse_args()

    import pickle
    import jax
    from genie_tpu.models.detector import Detector
    from genie_tpu.train.trainer import init_train_state, make_train_step
    from genie_tpu.infer.pipeline import InferencePipeline
    from genie_tpu.calibration.corrections import matched_catalog_stats

    sta_lla, sta_names = load_network()
    cfg, ctx, proj, tt = build_domain(args, sta_lla)
    print(f"NC network: {sta_lla.shape[0]} stations; domain "
          f"{cfg.region.lat_range} x {cfg.region.lon_range}", flush=True)

    # train without matmul-agg (remat rebuilds the aggregation matrices in
    # the backward); infer with it (forward-only, faster sweeps)
    model = Detector(src_chunk=16)
    model_inf = Detector(src_chunk=16, via_matmul=True)
    if args.load_params:
        params = pickle.loads(Path(args.load_params).read_bytes())
    else:
        key = jax.random.PRNGKey(0)
        state = init_train_state(model, cfg, ctx, tt.from_cart, key)
        step_fn, _ = make_train_step(model, cfg, ctx, tt.from_cart)
        t0 = time.time()
        for i in range(args.steps):
            key, k = jax.random.split(key)
            state, metrics = step_fn(state, k)
            if i % 200 == 0 or i == args.steps - 1:
                print(f"step {i} loss {float(metrics['loss']):.5f} "
                      f"trgts {np.asarray(metrics['trgts']).round(1)} "
                      f"preds {np.asarray(metrics['preds']).round(1)} "
                      f"({(time.time()-t0)/max(i,1):.2f}s/step)", flush=True)
        Path(args.save_params).write_bytes(pickle.dumps(
            jax.tree.map(np.asarray, state.params)))
        params = state.params

    pipe = InferencePipeline(model_inf, params, cfg, ctx, tt.from_cart)
    results = {}
    for day in args.days:
        pick_t, pick_sta, pick_ph, prob, ind_use, cat, ref_srcs = load_day(day)
        keep = prob >= args.min_prob
        pick_t, pick_sta, pick_ph = pick_t[keep], pick_sta[keep], pick_ph[keep]
        t1 = time.time()
        events = pipe.process(pick_t.astype(np.float32), pick_sta,
                              pick_ph.astype(np.float32), 0.0, args.t_end)
        dt_proc = time.time() - t1

        det = np.array([[*np.asarray(proj.to_lla_np(ev.pos_cart[None]))[0][:3],
                         ev.time] for ev in events]).reshape(-1, 4)
        # matcher works in Cartesian: convert all catalogs
        def to_cart4(lla_t):
            c = np.asarray(proj.to_cart_np(lla_t[:, :3]))
            return np.concatenate((c, lla_t[:, 3:4]), axis=1)

        det_c = np.array([[*ev.pos_cart, ev.time] for ev in events]).reshape(-1, 4)
        cat_keep = cat[cat[:, 3] < args.t_end]
        cat_c = to_cart4(cat_keep[:, :4])
        stats = matched_catalog_stats(det_c, cat_c, sig_x=25e3, sig_t=15.0,
                                      mags_ref=cat_keep[:, 4])
        # reference GENIE's own performance on the same day/span
        ref_keep = ref_srcs[ref_srcs[:, 3] < args.t_end]
        ref_c = to_cart4(ref_keep)
        ref_stats = matched_catalog_stats(ref_c, cat_c, sig_x=25e3, sig_t=15.0)
        results[day] = {
            "n_usgs": len(cat_c), "n_detected": stats["n_detected"],
            "n_matched": stats["n_matched"],
            "detection_rate": round(stats["detection_rate"], 3),
            "epi_err_m": stats.get("residual_xy_mean"),
            "t_err_s": stats.get("residual_t_mean"),
            "ref_n_detected": ref_stats["n_detected"],
            "ref_detection_rate": round(ref_stats["detection_rate"], 3),
            "process_time_s": round(dt_proc, 1),
        }
        print(day, results[day], flush=True)
    print(json.dumps(results) if args.json else results, flush=True)


if __name__ == "__main__":
    main()
