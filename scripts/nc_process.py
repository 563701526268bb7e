#!/usr/bin/env python
"""NC BSSA day processing + scoring: the production counterpart of
``nc_train.py`` (reference ``process_continuous_days.py`` applied to the
"100 continuous days" benchmark).

Loads the trained params (``run dir/params.pkl``), rebuilds the exact
training domain (cached kmeans grids + FMM-interpolated grid travel times +
PINN travel-time surrogate), then per day:

  * applies the day's observed subnetwork (``sta_ind_use``),
  * ensemble detection sweep over all grids onto the 10k-node query grid,
  * peaks -> clustering -> refinement -> association -> location -> QC,
  * scores vs the USGS M>1 catalog and the reference GENIE's own
    detections (``srcs_trv``) with the same matcher.

The stacked sweep series is cached per day (float16) so re-scoring at other
thresholds skips the expensive sweep:

    python scripts/nc_process.py --run projects/NC_EHZ/run2 \
        --days 2017_274 --thresh 0.2 --cache-sweep
"""

import argparse
import json
import pickle
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from nc_common import PROJECT_ROOT, list_days, load_day, load_network, nc_config, nc_projection


def build_runtime(run_dir: Path, n_grids=None, n_src=None, thresh=0.2,
                  n_query=None, corrections=None):
    """Reconstruct the training domain for inference (same caches as
    nc_train.py) and build the inference pipeline config."""
    import jax.numpy as jnp
    from genie_tpu.config import load_config
    from genie_tpu.train.trainer import build_domain_context
    from nc_train import build_grids, interp_fmm_at
    from genie_tpu.workflow import make_trv as _make_trv

    train_cfg = load_config(run_dir / "config.yaml")
    n_grids = n_grids or train_cfg.graph.n_grids
    n_src = n_src or train_cfg.graph.n_spatial_nodes
    cfg, sta_lla = nc_config(n_src=n_src, n_grids=n_grids,
                             n_batch=train_cfg.train.n_batch)
    cfg.model = train_cfg.model
    cfg.process.thresh = thresh
    cfg.process.thresh_assoc = thresh
    cfg.process.min_required_picks = 6
    cfg.process.min_required_sta = 4
    if n_query is not None:
        cfg.process.n_query_grid = n_query

    proj = nc_projection(cfg)
    sta_cart = np.asarray(proj.to_cart_np(sta_lla), np.float32)
    pinn_path = PROJECT_ROOT / "Grids" / "pinn_nc.pkl"
    trv = _make_trv(cfg, proj, pinn_path=pinn_path)
    print(f"travel times: {type(trv).__name__}", flush=True)

    grids_lla, grids_cart = build_grids(
        cfg, proj, n_grids, n_src, PROJECT_ROOT / "Grids" / f"grids_{n_src}.npz")
    tt_dir = PROJECT_ROOT / "TravelTimeData"
    tg_cache = PROJECT_ROOT / "Grids" / f"trv_grids_{n_src}_{n_grids}_fmm.npy"
    if tg_cache.exists():
        trv_grids = np.load(tg_cache)
    else:
        # reuse any cached superset (the 5-grid training cache) by slicing
        trv_grids = None
        for cand in sorted(tg_cache.parent.glob(f"trv_grids_{n_src}_*_fmm.npy")):
            arr = np.load(cand, mmap_mode="r")
            if arr.shape[0] >= n_grids:
                trv_grids = np.asarray(arr[:n_grids])
                break
        if trv_grids is None:
            ng, ns = grids_cart.shape[:2]
            trv_grids = interp_fmm_at(
                grids_cart.reshape(-1, 3), tt_dir,
                len(sta_cart)).reshape(ng, ns, len(sta_cart), 2)
            np.save(tg_cache, trv_grids)

    if corrections is not None:
        # calibrated travel-time corrections (nc_calibrate.py; ref
        # apply_calibration_routines.py:398-650): wrap the surrogate AND
        # shift the cached grid tables so the sweep featurization, the
        # association trunk, and location all see corrected times
        from genie_tpu.calibration.corrections import (TravelTimeCorrection,
                                                       interp_weighted)
        z = np.load(corrections)
        gc, coefs = jnp.asarray(z["grid_cart"]), jnp.asarray(z["coefs"])
        trv = TravelTimeCorrection(trv.from_cart, gc, coefs)
        ng, ns = grids_cart.shape[:2]
        corr = np.stack([np.asarray(interp_weighted(gc, coefs,
                                                    jnp.asarray(grids_cart[g])))
                         for g in range(ng)])
        trv_grids = trv_grids + corr
        print(f"corrections applied from {corrections} "
              f"(|corr| median {np.abs(corr).mean():.3f}s)", flush=True)

    ctx = build_domain_context(cfg, sta_lla.astype(np.float32), sta_cart,
                               grids_lla.astype(np.float32), grids_cart,
                               trv_grids)
    return cfg, ctx, proj, trv, sta_lla


def score(proj, events, cat, ref_srcs, t_end, sig_x=25e3, sig_t=15.0):
    from genie_tpu.calibration.corrections import matched_catalog_stats

    def to_cart4(lla_t):
        c = np.asarray(proj.to_cart_np(lla_t[:, :3]))
        return np.concatenate((c, lla_t[:, 3:4]), axis=1)

    det_c = np.array([[*ev.pos_cart, ev.time] for ev in events]).reshape(-1, 4)
    cat_keep = cat[cat[:, 3] < t_end]
    cat_c = to_cart4(cat_keep[:, :4])
    stats = matched_catalog_stats(det_c, cat_c, sig_x=sig_x, sig_t=sig_t,
                                  mags_ref=cat_keep[:, 4])
    ref_keep = ref_srcs[ref_srcs[:, 3] < t_end]
    ref_stats = matched_catalog_stats(to_cart4(ref_keep), cat_c,
                                      sig_x=sig_x, sig_t=sig_t)
    out = {
        "n_usgs": int(len(cat_c)),
        "n_detected": int(stats["n_detected"]),
        "n_matched": int(stats["n_matched"]),
        "detection_rate": round(float(stats["detection_rate"]), 3),
        "epi_err_m": stats.get("residual_xy_mean"),
        "t_err_s": stats.get("residual_t_mean"),
        "ref_n_detected": int(ref_stats["n_detected"]),
        "ref_n_matched": int(ref_stats["n_matched"]),
        "ref_detection_rate": round(float(ref_stats["detection_rate"]), 3),
    }
    # per-matched-event residuals (VERDICT r4 weak #8: mean-only evals made
    # outlier days illegible) + robust summaries
    from genie_tpu.infer.assign import maximize_bipartite_assignment as _mba
    ia, ib = _mba(det_c, cat_c, sig_x=sig_x, sig_t=sig_t)
    if len(ia):
        epi = np.linalg.norm(det_c[ia, :2] - cat_c[ib, :2], axis=1)
        dts = det_c[ia, 3] - cat_c[ib, 3]
        out["per_event"] = [
            {"usgs_t": round(float(cat_keep[b, 3]), 1),
             "mag": round(float(cat_keep[b, 4]), 2),
             "epi_m": round(float(e), 1), "dt_s": round(float(d), 2)}
            for b, e, d in zip(ib, epi, dts)]
        out["epi_err_median_m"] = round(float(np.median(epi)), 1)
        out["epi_err_p90_m"] = round(float(np.percentile(epi, 90)), 1)
        out["t_err_median_s"] = round(float(np.median(np.abs(dts))), 2)
    # per-magnitude-bin detection rates + bin counts (ref apply_calibration_
    # routines.py:317-336); counts let multi-day summaries pool exactly
    for m in (1.0, 2.0, 3.0, 4.0):
        key = f"detection_rate_M{m:g}"
        if key in stats:
            n_bin = int((cat_keep[:, 4] >= m).sum())
            out[key] = round(float(stats[key]), 3)
            out[f"n_usgs_M{m:g}"] = n_bin
    # magnitude residuals vs USGS for matched events that got a magnitude
    mags = np.array([m if (m := getattr(ev, "mag", None)) is not None
                     else np.nan for ev in events], np.float64).reshape(-1)
    if np.isfinite(mags).any() and len(det_c) and len(cat_c):
        from genie_tpu.infer.assign import maximize_bipartite_assignment
        ia, ib = maximize_bipartite_assignment(det_c, cat_c,
                                               sig_x=sig_x, sig_t=sig_t)
        ok = np.isfinite(mags[ia])
        if ok.any():
            r = mags[ia][ok] - cat_keep[ib][ok, 4]
            out["mag_n"] = int(ok.sum())
            out["mag_resid_median"] = round(float(np.median(r)), 3)
            out["mag_resid_mad"] = round(
                float(np.median(np.abs(r - np.median(r)))), 3)
    return out


def probe_events(proj, x_query, times_s, series, cat, t_end, t_pad=40.0,
                 k=5):
    """Per-USGS-event detection signal: max sweep score over the k query
    nodes nearest the catalog epicenter within ±t_pad of the origin time.
    Reads sub-threshold signal strength directly — the diagnostic for
    partially-trained checkpoints (round-1 failure showed ~0.006 here)."""
    xq = np.asarray(x_query)
    out = []
    for ev in cat:
        if ev[3] >= t_end:
            continue
        c = np.asarray(proj.to_cart_np(ev[None, :3]))[0]
        d = np.linalg.norm(xq - c[None], axis=1)
        nn = np.argsort(d)[:k]
        tm = (times_s >= ev[3] - t_pad) & (times_s <= ev[3] + t_pad)
        sc = float(series[np.ix_(nn, np.where(tm)[0])].max()) if tm.any() else np.nan
        out.append((float(ev[3]), float(ev[4]), float(d[nn[0]]) / 1e3, sc))
        print(f"  usgs t={ev[3]:7.0f}s M{ev[4]:.1f} nearest-node "
              f"{d[nn[0]]/1e3:5.1f} km -> score {sc:.3f}", flush=True)
    if out:
        scs = np.array([o[3] for o in out])
        print(f"  probe: {np.isfinite(scs).sum()} events, median score "
              f"{np.nanmedian(scs):.3f}, max {np.nanmax(scs):.3f}", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default=str(PROJECT_ROOT / "run2"))
    ap.add_argument("--days", nargs="+", default=["2017_274"])
    ap.add_argument("--dataset", choices=["100", "500"], default="100",
                    help="BSSA benchmark dataset (100 continuous days / "
                         "500 random day test)")
    ap.add_argument("--thresh", type=float, nargs="+", default=[0.2])
    ap.add_argument("--n-query", type=int, default=None)
    ap.add_argument("--n-grids", type=int, default=None,
                    help="sweep-ensemble grid count, subset at sweep time "
                         "(default: all trained grids; 1 = fast eval)")
    ap.add_argument("--gather", action="store_true",
                    help="use the fixed-k gather aggregation path instead "
                         "of the dense matmul path in the sweep")
    ap.add_argument("--min-prob", type=float, default=0.3)
    ap.add_argument("--t-end", type=float, default=86400.0)
    ap.add_argument("--cache-sweep", action="store_true",
                    help="cache the stacked day series (float16) in the run dir")
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--probe", action="store_true",
                    help="print per-USGS-event sweep scores at the event "
                         "location/time (sub-threshold diagnostics)")
    ap.add_argument("--half", action="store_true",
                    help="bf16 detection sweep (2x MXU/HBM; scores deviate "
                         "<~1e-2 from f32)")
    ap.add_argument("--mag-model", default=None,
                    help="fitted magnitude model pickle (nc_magnitude --save); "
                         "assigns event magnitudes when the dataset ships "
                         "amplitudes (500-day schema)")
    ap.add_argument("--corrections", default=None,
                    help="calibrated travel-time corrections npz "
                         "(nc_calibrate.py output); wraps the surrogate and "
                         "shifts the cached grid tables")
    ap.add_argument("--sweep-only", action="store_true",
                    help="compute + cache the day sweep and stop (campaign "
                         "sweep pass; post-processing runs later from cache)")
    ap.add_argument("--save-catalog", action="store_true",
                    help="save per-day catalog hdf5 into the run dir")
    ap.add_argument("--window-batch", type=int, default=16,
                    help="windows per sweep dispatch (changes the sweep "
                         "checkpoint fingerprint)")
    ap.add_argument("--assoc-mode", choices=["per_source", "span"],
                    default=None,
                    help="association windowing (default: config default)")
    ap.add_argument("--trace-usgs", action="store_true",
                    help="audit the day's USGS events through every post "
                         "stage (per-stage coverage ledger; diagnosis)")
    ap.add_argument("--catalog-thresh", type=float, default=None,
                    help="threshold whose events become the saved catalog "
                         "(default: the LAST of --thresh; a trailing 0.5 "
                         "with zero detections silently saved an empty "
                         "catalog before this flag)")
    args = ap.parse_args()

    import jax.numpy as jnp
    from genie_tpu.infer.pipeline import InferencePipeline
    from genie_tpu.models.detector import Detector

    run_dir = Path(args.run)
    blob = pickle.loads((run_dir / "params.pkl").read_bytes())
    params = blob["params"] if isinstance(blob, dict) and "params" in blob else blob
    print(f"params from {run_dir} (step {blob.get('step', '?') if isinstance(blob, dict) else '?'})",
          flush=True)

    cfg, ctx, proj, trv, sta_lla = build_runtime(
        run_dir, thresh=min(args.thresh), n_query=args.n_query,
        corrections=args.corrections)
    if args.assoc_mode:
        cfg.process.assoc_mode = args.assoc_mode
    # grid-ensemble subsetting happens at sweep time (same domain/caches)
    sweep_grids = list(range(args.n_grids)) if args.n_grids else None
    model_inf = Detector(
        src_chunk=16, normalize_readin=cfg.model.normalize_readin,
        via_matmul=not args.gather,
        scale_rel=cfg.model.scale_rel, kernel_sig_t=cfg.model.kernel_sig_t,
        use_phase_types=cfg.model.use_phase_types,
        use_absolute_pos=cfg.model.use_absolute_pos,
        use_updated_model_definition=cfg.model.use_updated_model_definition)
    mag_model = None
    if args.mag_model:
        from genie_tpu.models.magnitude import MagnitudeModel
        mm = pickle.loads(Path(args.mag_model).read_bytes())
        mag_model = {"model": MagnitudeModel(n_sta=mm["n_sta"],
                                             n_grid=len(mm["grid_cart"]),
                                             k=mm.get("k", 1)),
                     "params": mm["params"], "grid_cart": mm["grid_cart"],
                     "dist_model": mm.get("dist_model")}
        print(f"magnitude model from {args.mag_model} "
              f"(vald {mm.get('vald')})", flush=True)

    # backend-exact query grid: the cached day sweeps' series rows refer to
    # the TPU-computed kmeans grid (nc_xquery_dump.py); loading it here keeps
    # CPU re-scoring consistent and skips the per-run kmeans
    xq_cache = PROJECT_ROOT / "Grids" / f"x_query_{cfg.process.n_query_grid}.npy"
    x_query = np.load(xq_cache) if xq_cache.exists() else None
    pipe = InferencePipeline(model_inf, params, cfg, ctx, trv.from_cart,
                             verbose=True, sweep_half=args.half,
                             mag_model=mag_model, x_query_grid=x_query)

    all_results = {}
    for day in args.days:
        pick_t, pick_sta, pick_ph, prob, ind_use, cat, ref_srcs, pick_amp = \
            load_day(day, dataset=args.dataset, return_amp=True)
        keep = prob >= args.min_prob
        pick_t, pick_sta, pick_ph = pick_t[keep], pick_sta[keep], pick_ph[keep]
        if pick_amp is not None:
            pick_amp = pick_amp[keep]
        pipe.set_station_mask(ind_use)
        print(f"--- {day}: {len(pick_t)} picks >= p{args.min_prob}, "
              f"{len(ind_use)} stations", flush=True)

        # cache key includes everything the series depends on: query-set
        # size, pick prob floor, and the params checkpoint step
        step = blob.get("step", 0) if isinstance(blob, dict) else 0
        n_q = int(pipe.x_query.shape[0])
        half_tag = "_bf16" if args.half else ""
        g_tag = f"_g{args.n_grids}" if args.n_grids else ""
        c_tag = "_corr" if args.corrections else ""
        cache_f = run_dir / f"sweep_{day}_q{n_q}_p{args.min_prob}_s{step}{half_tag}{g_tag}{c_tag}.npz"
        t0 = time.time()
        if cache_f.exists():
            z = np.load(cache_f)
            times_s, series = z["times_s"], z["series"].astype(np.float32)
            assert series.shape[0] == n_q, \
                f"stale sweep cache {cache_f}: {series.shape[0]} != {n_q}"
            print(f"sweep from cache {cache_f}", flush=True)
        else:
            # partial-sweep checkpoint: a crashed/restarted run resumes from
            # the last ~40 completed batches instead of re-sweeping the day
            times_s, series = pipe.detection_sweep(
                pick_t.astype(np.float32), pick_sta, pick_ph.astype(np.float32),
                0.0, args.t_end, grids=sweep_grids,
                window_batch=args.window_batch,
                checkpoint_path=cache_f.with_suffix(".partial.npz"))
            if args.cache_sweep:
                np.savez_compressed(cache_f, times_s=times_s,
                                    series=series.astype(np.float16))
        t_sweep = time.time() - t0
        print(f"sweep {t_sweep:.0f}s; series max {series.max():.3f} "
              f"p99.9 {np.percentile(series, 99.9):.3f}", flush=True)
        if args.probe:
            probe_events(proj, pipe.x_query, times_s, series, cat, args.t_end)
        if args.sweep_only:
            all_results[day] = {"sweep_s": round(t_sweep, 1)}
            continue

        trace = None
        if args.trace_usgs:
            cat_keep = cat[cat[:, 3] < args.t_end]
            trace = np.concatenate(
                (np.asarray(proj.to_cart_np(cat_keep[:, :3])),
                 cat_keep[:, 3:4]), axis=1)
        day_res = {}
        for th in args.thresh:
            t1 = time.time()
            cfg.process.thresh = th
            cfg.process.thresh_assoc = th
            events = pipe.process_from_sweep(
                times_s, series, pick_t.astype(np.float32), pick_sta,
                pick_ph.astype(np.float32), pick_amp=pick_amp, thresh=th,
                trace=trace)
            res = score(proj, events, cat, ref_srcs, args.t_end)
            res["process_time_s"] = round(t_sweep + time.time() - t1, 1)
            res["sweep_time_s"] = round(t_sweep, 1)   # 0 when cache-hit
            res["post_time_s"] = round(time.time() - t1, 1)
            res["thresh"] = th
            day_res[str(th)] = res
            print(day, th, res, flush=True)
            cat_th = (args.catalog_thresh if args.catalog_thresh is not None
                      else args.thresh[-1])
            if args.save_catalog and th == cat_th:
                from genie_tpu.io import save_catalog
                save_catalog(run_dir / f"catalog_{day}.hdf5", events,
                             pick_t=pick_t, pick_sta=pick_sta)
                from genie_tpu.viz import plot_catalog_day
                det4 = np.array([[*ev.pos_cart, ev.time]
                                 for ev in events]).reshape(-1, 4)
                cat_keep = cat[cat[:, 3] < args.t_end]
                usgs4 = np.concatenate(
                    (np.asarray(proj.to_cart_np(cat_keep[:, :3])),
                     cat_keep[:, 3:4]), axis=1)
                plot_catalog_day(run_dir / f"catalog_{day}.png", det4, usgs4,
                                 usgs_mags=cat_keep[:, 4],
                                 title=f"{day} thresh {th}")
        all_results[day] = day_res

    print(json.dumps(all_results), flush=True)
    if args.json_out:
        Path(args.json_out).write_text(json.dumps(all_results, indent=1))


if __name__ == "__main__":
    main()
