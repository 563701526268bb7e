#!/usr/bin/env python
"""Fit + evaluate the local magnitude scale on a real BSSA day with
amplitudes (the 500-random-day dataset ships them) — the reference's
``calibrate_and_apply_magnitude_scale.py`` flow: collect (event, station,
phase, log-amplitude, catalog-magnitude) observations from matched events,
fit the distance-attenuation + station-bias model, report magnitude
residual quantiles and r² (ref :748-756), and invert magnitudes for all
events.

Two observation sources:
  * ``--from-usgs`` (default): build observations directly from the USGS
    M>1 catalog — picks within ±1.5 s of the travel-time model's predicted
    arrivals. Decouples the magnitude-scale measurement from detector
    quality.
  * ``--catalog <hdf5>``: use a processed day catalog's own associations
    (nc_process --save-catalog --dataset 500), matched to USGS for target
    magnitudes.

    python scripts/nc_magnitude.py --day 2000_012 [--steps 3000]
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
    ap.add_argument("--days", nargs="+", default=["2000_012"])
    ap.add_argument("--dataset", default="500")
    ap.add_argument("--catalog", default=None,
                    help="processed day catalog hdf5; default --from-usgs")
    ap.add_argument("--min-prob", type=float, default=0.3)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--t-assoc", type=float, default=1.5)
    ap.add_argument("--holdout", type=float, default=0.25)
    ap.add_argument("--min-obs", type=int, default=6,
                    help="drop events with fewer matched amplitude "
                         "observations (sparse events are dominated by "
                         "single misassociated picks)")
    ap.add_argument("--n-grid", type=int, default=8,
                    help="bias-field spatial support nodes (small: the bias "
                         "is mostly a per-station correction; large grids "
                         "memorize individual events on small catalogs)")
    ap.add_argument("--bias-reg", type=float, default=3.0,
                    help="penalty on spatial variation of the bias field "
                         "around its per-station mean")
    ap.add_argument("--save", default=None,
                    help="persist the fitted model (pickle with params, "
                         "bias grid, k) for nc_process --mag-model")
    ap.add_argument("--diag", action="store_true",
                    help="print fitted coefficients and forward log-amp "
                         "residuals (per split and per day)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from genie_tpu.models.magnitude import MagnitudeModel, fit_magnitude_model
    from genie_tpu.workflow import make_trv

    cfg, sta_lla = nc_config()
    proj = nc_projection(cfg)
    sta_cart = np.asarray(proj.to_cart_np(sta_lla), np.float32)
    trv = make_trv(cfg, proj, pinn_path=PROJECT_ROOT / "Grids" / "pinn_nc.pkl")

    # ---- observations: (src_cart, sta_idx, phase, log_amp, mag) ----------
    obs_src, obs_sta, obs_ph, obs_amp, obs_mag, obs_ev = [], [], [], [], [], []
    ev_base = 0
    day_ranges = {}
    if args.catalog:
        pick_t, pick_sta, pick_ph, prob, ind_use, cat, _, amp = load_day(
            args.days[0], dataset=args.dataset, return_amp=True)
        keep = prob >= args.min_prob
        pick_t, pick_sta, pick_ph, amp = (pick_t[keep], pick_sta[keep],
                                          pick_ph[keep], amp[keep])
        from genie_tpu.calibration.corrections import matched_catalog_stats
        from genie_tpu.io import load_catalog
        events = load_catalog(args.catalog)
        det = np.array([[*ev.pos_cart, ev.time] for ev in events]).reshape(-1, 4)
        ref4 = np.concatenate([np.asarray(proj.to_cart_np(cat[:, :3])),
                               cat[:, 3:4]], axis=1)
        from genie_tpu.infer.assign import maximize_bipartite_assignment
        ia, ib = maximize_bipartite_assignment(det, ref4, sig_x=25e3, sig_t=10.0)
        print(f"{len(ia)} detections matched to USGS")
        for k, (i, j) in enumerate(zip(ia, ib)):
            ev = events[i]
            for p_idx, ph in zip(ev.picks, ev.pick_phases):
                if amp[p_idx] > 0:
                    obs_src.append(ev.pos_cart)
                    obs_sta.append(pick_sta[p_idx])
                    obs_ph.append(int(ph))
                    obs_amp.append(np.log10(amp[p_idx]))
                    obs_mag.append(cat[j, 4])
                    obs_ev.append(k)
    else:
      for day in args.days:
        pick_t, pick_sta, pick_ph, prob, ind_use, cat, _, amp = load_day(
            day, dataset=args.dataset, return_amp=True)
        keep = prob >= args.min_prob
        pick_t, pick_sta, pick_ph, amp = (pick_t[keep], pick_sta[keep],
                                          pick_ph[keep], amp[keep])
        print(f"{day}: {len(pick_t)} picks, {len(cat)} USGS events "
              f"(M {cat[:, 4].min():.1f}..{cat[:, 4].max():.1f})", flush=True)
        for k, ev in enumerate(cat, start=ev_base):
            src = np.asarray(proj.to_cart_np(ev[None, :3]), np.float32)
            tt = np.asarray(trv.from_cart(jnp.asarray(sta_cart),
                                          jnp.asarray(src)))[0]
            for ph in (0, 1):
                t_pred = ev[3] + tt[:, ph]
                for si in ind_use:
                    m = (pick_sta == si) & (pick_ph == ph)
                    if not m.any():
                        continue
                    dt = np.abs(pick_t[m] - t_pred[si])
                    jmin = np.argmin(dt)
                    if dt[jmin] < args.t_assoc and amp[m][jmin] > 0:
                        obs_src.append(src[0])
                        obs_sta.append(si)
                        obs_ph.append(ph)
                        obs_amp.append(np.log10(amp[m][jmin]))
                        obs_mag.append(ev[4])
                        obs_ev.append(k)
        day_ranges[day] = (ev_base, ev_base + len(cat))
        ev_base += len(cat)

    obs_src = np.asarray(obs_src, np.float32)
    obs_sta = np.asarray(obs_sta, np.int32)
    obs_ph = np.asarray(obs_ph, np.int32)
    obs_amp = np.asarray(obs_amp, np.float32)
    obs_mag = np.asarray(obs_mag, np.float32)
    obs_ev = np.asarray(obs_ev)
    # Event-level support gate: an event observed by only a couple of
    # stations pins its inverted magnitude on 1-2 amplitudes, and a single
    # misassociated far-station pick (the ±t_assoc nearest-pick match has no
    # other QC) throws it by a full magnitude unit — the heavy validation
    # tail. The reference's calibration fits on its own associated catalog
    # where events carry full pick sets (ref
    # calibrate_and_apply_magnitude_scale.py:640-713).
    if args.min_obs > 1:
        ev_ids, ev_counts = np.unique(obs_ev, return_counts=True)
        ok_ev = set(ev_ids[ev_counts >= args.min_obs].tolist())
        keep = np.array([e in ok_ev for e in obs_ev])
        obs_src, obs_sta, obs_ph, obs_amp, obs_mag, obs_ev = (
            obs_src[keep], obs_sta[keep], obs_ph[keep], obs_amp[keep],
            obs_mag[keep], obs_ev[keep])
    print(f"{len(obs_src)} amplitude observations from "
          f"{len(np.unique(obs_ev))} events (min_obs={args.min_obs})")
    if len(obs_src) < 30:
        print(json.dumps({"error": "too few observations"}))
        return

    # ---- event-level holdout split ---------------------------------------
    rng = np.random.default_rng(0)
    evs = np.unique(obs_ev)
    vald_evs = set(rng.choice(evs, max(1, int(args.holdout * len(evs))),
                              replace=False).tolist())
    vm = np.array([e in vald_evs for e in obs_ev])
    tm = ~vm

    # ---- bias-support grid: coarse kmeans of observation sources ---------
    uniq = np.unique(obs_src, axis=0)
    n_g = min(args.n_grid, len(uniq))
    grid_cart = uniq[rng.choice(len(uniq), n_g, replace=False)].copy()
    for _ in range(10):  # plain Lloyd iterations
        d = np.linalg.norm(uniq[:, None] - grid_cart[None], axis=2)
        lab = d.argmin(1)
        for g in range(n_g):
            if (lab == g).any():
                grid_cart[g] = uniq[lab == g].mean(0)

    # the differential loss runs over sampled same-event pair indices, so
    # the fit takes every training observation
    fit_idx = np.where(tm)[0]
    model, params = fit_magnitude_model(
        jax.random.PRNGKey(1), sta_cart, grid_cart,
        obs_src[fit_idx], obs_sta[fit_idx], obs_ph[fit_idx],
        obs_amp[fit_idx], obs_mag[fit_idx], n_steps=args.steps,
        w_bias_reg=args.bias_reg)

    def invert(m):
        pred = model.apply(params, jnp.asarray(obs_src[m]), jnp.asarray(sta_cart),
                           jnp.asarray(grid_cart), jnp.asarray(obs_sta[m]),
                           jnp.asarray(obs_ph[m]), log_amp=jnp.asarray(obs_amp[m]))
        pred = np.asarray(pred)
        # per-event median of per-observation inverted magnitudes
        out_pred, out_true = [], []
        for e in np.unique(obs_ev[m]):
            em = obs_ev[m] == e
            out_pred.append(np.median(pred[em]))
            out_true.append(obs_mag[m][em][0])
        return np.asarray(out_pred), np.asarray(out_true)

    if args.diag:
        import jax.nn
        c = params["params"]
        a1 = np.asarray(jax.nn.softplus(c["mag_coef"]))
        a2 = np.asarray(jax.nn.softplus(c["epicenter_spatial_coef"]))
        a3 = np.asarray(c["depth_spatial_coef"])
        print(f"[diag] a1(mag)={a1.round(3)} a2(epi)={a2.round(3)} "
              f"a3(dep)={a3.round(3)} |bias| med "
              f"{np.median(np.abs(np.asarray(c['bias']))):.3f}")
        fwd = np.asarray(model.apply(
            params, jnp.asarray(obs_src), jnp.asarray(sta_cart),
            jnp.asarray(grid_cart), jnp.asarray(obs_sta),
            jnp.asarray(obs_ph), mag=jnp.asarray(obs_mag)))
        e = fwd - obs_amp
        fit_mask = np.zeros(len(e), bool)
        fit_mask[fit_idx] = True
        for name, m in (("fit-obs", fit_mask), ("train-obs", tm),
                        ("vald-obs", vm)):
            print(f"[diag] fwd resid {name}: n={int(m.sum())} "
                  f"median={np.median(e[m]):.3f} mad="
                  f"{np.median(np.abs(e[m] - np.median(e[m]))):.3f}")
        for day, (lo, hi) in day_ranges.items():
            m = (obs_ev >= lo) & (obs_ev < hi)
            if m.any():
                print(f"[diag] fwd resid day {day}: n={int(m.sum())} "
                      f"median={np.median(e[m]):.3f}")

    if args.diag:
        # per-event validation residuals: distinguishes "a few corrupted
        # events" from a systematic generalization failure
        pred = np.asarray(model.apply(
            params, jnp.asarray(obs_src[vm]), jnp.asarray(sta_cart),
            jnp.asarray(grid_cart), jnp.asarray(obs_sta[vm]),
            jnp.asarray(obs_ph[vm]), log_amp=jnp.asarray(obs_amp[vm])))
        ev2day = {}
        for day, (lo, hi) in day_ranges.items():
            for e in range(lo, hi):
                ev2day[e] = day
        rows = []
        for e in np.unique(obs_ev[vm]):
            em = obs_ev[vm] == e
            r = float(np.median(pred[em]) - obs_mag[vm][em][0])
            rows.append((abs(r), r, int(em.sum()), ev2day.get(int(e), "?"),
                         float(obs_mag[vm][em][0])))
        for _, r, n, day, mt_ in sorted(rows, reverse=True)[:12]:
            print(f"[diag] vald event resid {r:+.2f} (n_obs {n}, day {day}, "
                  f"M{mt_:.1f})")

    res = {}
    for name, m in (("train", tm), ("vald", vm)):
        mp, mt = invert(m)
        r = mp - mt
        ss_res = ((mp - mt) ** 2).sum()
        ss_tot = ((mt - mt.mean()) ** 2).sum() + 1e-12
        res[name] = {
            "n_events": int(len(mt)),
            "resid_median": round(float(np.median(r)), 3),
            "resid_q10_q90": [round(float(np.quantile(r, q)), 3)
                              for q in (0.1, 0.9)],
            "resid_mad": round(float(np.median(np.abs(r - np.median(r)))), 3),
            "r2": round(float(1 - ss_res / ss_tot), 3),
        }
        print(name, res[name])
    print(json.dumps(res))

    if args.save:
        import pickle
        from genie_tpu.calibration.magnitude_scale import (
            fit_magnitude_distance_params)
        # magnitude -> max plausible association distance, fitted on every
        # observed (mag, epicentral distance) pair (ref calibrate_and_apply_
        # magnitude_scale.py:786-884 distance_magnitude_model); consumed by
        # InferencePipeline.magnitude_distance_qc
        d_epi = np.linalg.norm(obs_src[:, :2] - sta_cart[obs_sta, :2], axis=1)
        dist_model = fit_magnitude_distance_params(obs_mag, d_epi)
        Path(args.save).write_bytes(pickle.dumps(
            {"params": jax.device_get(params), "grid_cart": grid_cart,
             "k": 1, "n_sta": sta_cart.shape[0], "vald": res["vald"],
             "dist_model": dist_model}))
        print(f"saved magnitude model to {args.save} "
              f"(dist_model {dist_model['kind']})")


if __name__ == "__main__":
    main()
