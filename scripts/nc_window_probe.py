#!/usr/bin/env python
"""Single-window A/B diagnostic for real-data detection transfer.

For one USGS event on a BSSA day, runs the trained detector on
  (a) the real pick window around the event,
  (b) the same window with a synthetic event planted at the USGS location
      (picks at PINN moveout times on the day's active stations),
  (c) variants interpolating between the two (real picks + planted picks,
      planted restricted to the stations that really picked, ...),
and prints the max query-node detection score near the event for each.

Isolates which property of real windows (pick set, timing, density,
station subset) kills the score that synthetics earn (~0.5-0.6).
"""

import argparse
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from nc_common import PROJECT_ROOT, load_day
from nc_process import build_runtime


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default=str(PROJECT_ROOT / "run2"))
    ap.add_argument("--day", default="2017_274")
    ap.add_argument("--event", type=int, default=0)
    ap.add_argument("--min-prob", type=float, default=0.3)
    args = ap.parse_args()

    import jax.numpy as jnp
    from genie_tpu.infer.pipeline import InferencePipeline
    from genie_tpu.models.detector import Detector

    run_dir = Path(args.run)
    blob = pickle.loads((run_dir / "params.pkl").read_bytes())
    params = blob["params"] if isinstance(blob, dict) and "params" in blob else blob
    cfg, ctx, proj, trv, sta_lla = build_runtime(run_dir, thresh=0.1)
    model_inf = Detector(
        src_chunk=16, normalize_readin=cfg.model.normalize_readin,
        via_matmul=True,
        scale_rel=cfg.model.scale_rel, kernel_sig_t=cfg.model.kernel_sig_t,
        use_phase_types=cfg.model.use_phase_types,
        use_absolute_pos=cfg.model.use_absolute_pos,
        use_updated_model_definition=cfg.model.use_updated_model_definition)
    pipe = InferencePipeline(model_inf, params, cfg, ctx, trv.from_cart,
                             verbose=False)

    pick_t, pick_sta, pick_ph, prob, ind_use, cat, ref_srcs = \
        load_day(args.day)[:7]
    keep = prob >= args.min_prob
    pick_t, pick_sta, pick_ph = pick_t[keep], pick_sta[keep], pick_ph[keep]
    pipe.set_station_mask(ind_use)

    ev = cat[args.event]
    lat, lon, dep, t0_ev, mag = ev[:5]
    src = np.asarray(proj.to_cart_np(np.array([[lat, lon, dep]])), np.float32)
    sta_cart = np.asarray(ctx.sta_cart)
    tt = np.asarray(trv.from_cart(jnp.asarray(sta_cart), jnp.asarray(src)))[0]
    d_sta = np.linalg.norm(sta_cart - src[0], axis=1)
    active = np.zeros(len(sta_cart), bool)
    active[ind_use] = True

    # stations whose real picks match the PINN moveout within 5 s
    real_p, real_s = set(), set()
    for si in np.where(active)[0]:
        pk = pick_t[pick_sta == si]
        if len(pk) == 0:
            continue
        if np.abs(pk - (t0_ev + tt[si, 0])).min() < 5.0:
            real_p.add(si)
        if np.abs(pk - (t0_ev + tt[si, 1])).min() < 5.0:
            real_s.add(si)
    print(f"event M{mag:.1f} t0={t0_ev:.0f}: {len(real_p)} P-matched, "
          f"{len(real_s)} S-matched stations of {active.sum()} active")

    xq = np.asarray(pipe.x_query)
    dq = np.linalg.norm(xq - src[0], axis=1)
    near_q = np.argsort(dq)[:8]
    print(f"nearest query nodes at {np.round(np.sort(dq)[:3] / 1e3, 1)} km")

    t_win = cfg.model.t_win

    def run_window(pt, ps, pp, label):
        """Score one window with the sweep's own featurization/forward."""
        tp, ip, ph, pm, _ = pipe._window_picks(
            pt.astype(np.float32), ps.astype(np.int64),
            pp.astype(np.float32), t0_ev)
        out = None
        tp_b = jnp.asarray(np.repeat(tp[None], 16, 0))
        ip_b = jnp.asarray(np.repeat(ip[None], 16, 0))
        ph_b = jnp.asarray(np.repeat(ph[None], 16, 0))
        pm_b = jnp.asarray(np.repeat(pm[None], 16, 0))
        for g in range(pipe.n_grids):
            o = pipe._sweep_batch_fn(tp_b, ip_b, ph_b, pm_b, pipe.sta_mask,
                                     pipe.sta_nbr, pipe.sta_nbr_valid, g)
            out = o if out is None else out + o
        out = np.asarray(out[0]) / pipe.n_grids  # (n_q, n_t)
        mx = out[near_q].max()
        print(f"{label:55s} n_picks={int(pm.sum()):4d} "
              f"near-event max={mx:.3f} global max={out.max():.3f}")
        return out

    # (a) real picks
    run_window(pick_t, pick_sta, pick_ph, "(a) real picks")

    # (b) planted synthetic picks on all active stations within 350 km
    plant_sta = np.where(active & (d_sta < 350e3))[0]
    pr, sr = [], []
    for si in plant_sta:
        pr.append((t0_ev + tt[si, 0], si, 0.0))
        sr.append((t0_ev + tt[si, 1], si, 1.0))
    plant = np.array(pr + sr)
    run_window(plant[:, 0], plant[:, 1].astype(np.int64), plant[:, 2],
               f"(b) planted all {len(plant_sta)} active sta <350 km")

    # (c) planted picks only at the stations that really matched
    pc = [(t0_ev + tt[si, 0], si, 0.0) for si in sorted(real_p)]
    sc = [(t0_ev + tt[si, 1], si, 1.0) for si in sorted(real_s)]
    if pc or sc:
        plc = np.array(pc + sc)
        run_window(plc[:, 0], plc[:, 1].astype(np.int64), plc[:, 2],
                   f"(c) planted only matched sta ({len(pc)}P/{len(sc)}S)")

    # (d) real picks + planted picks (does clutter suppress?)
    both = np.concatenate([
        np.column_stack([pick_t, pick_sta, pick_ph]), plant])
    run_window(both[:, 0], both[:, 1].astype(np.int64), both[:, 2],
               "(d) real + planted")

    # (e) real picks, restricted to +-60s around the event
    w = np.abs(pick_t - t0_ev) < 60.0
    run_window(pick_t[w], pick_sta[w], pick_ph[w],
               "(e) real picks within +-60 s only")


if __name__ == "__main__":
    main()
