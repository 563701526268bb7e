#!/usr/bin/env python
"""Per-missed-event diagnosis against cached day sweeps (CPU-only).

For each campaign day: match the saved catalog (detections at the catalog
operating point) to the USGS M>1 reference, and for every USGS event —
matched or missed — record:

  * the max sweep score over the k query nodes nearest the USGS epicenter
    within +-t_pad of the origin time (what the detector saw there),
  * the nearest detection in space-time (was it detected but mislocated /
    deduped / dropped in post?),
  * whether the reference GENIE's own shipped detections matched it.

Classifies each miss: ``sub-0.2`` (sweep never fired — needs ensemble or
retraining), ``0.2-thresh`` (recoverable by the 0.2 operating point),
``post-loss`` (sweep fired above threshold but the event fell out of the
post chain).  This is VERDICT r4 "next" #1's diagnosis step; the machinery
mirrors nc_process.probe_events + the reference's matched-catalog stats
(apply_calibration_routines.py:317-336).

    python scripts/nc_diagnose.py --run projects/NC_EHZ/run6 \
        --days 2017_276 2017_278 ... --thresh 0.25 --json-out diag.json
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
    ap.add_argument("--run", default=str(PROJECT_ROOT / "run6"))
    ap.add_argument("--days", nargs="+", required=True)
    ap.add_argument("--thresh", type=float, default=0.25,
                    help="operating point of the saved catalogs")
    ap.add_argument("--t-pad", type=float, default=40.0)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--t-end", type=float, default=86400.0)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    import h5py
    from genie_tpu.infer.assign import maximize_bipartite_assignment

    cfg, _ = nc_config()
    proj = nc_projection(cfg)
    xq = np.load(PROJECT_ROOT / "Grids" / "x_query_10000.npy")
    run = Path(args.run)

    per_day = {}
    counts = {"matched": 0, "post-loss": 0, "0.2-thresh": 0, "sub-0.2": 0}
    for day in args.days:
        *_, cat, ref_srcs, _amp = load_day(day, return_amp=True)
        cat = cat[cat[:, 3] < args.t_end]
        ref_srcs = ref_srcs[ref_srcs[:, 3] < args.t_end]
        cat_c = np.concatenate((np.asarray(proj.to_cart_np(cat[:, :3])),
                                cat[:, 3:4]), axis=1)
        ref_c = np.concatenate((np.asarray(proj.to_cart_np(ref_srcs[:, :3])),
                                ref_srcs[:, 3:4]), axis=1)
        cat_f = run / f"catalog_{day}.hdf5"
        caches = sorted(run.glob(f"sweep_{day}_q{len(xq)}_*_g1.npz"))
        if not cat_f.exists() or not caches:
            print(f"--- {day}: missing catalog or sweep cache, skipped")
            continue
        with h5py.File(cat_f, "r") as f:
            det = np.asarray(f["srcs"])
        z = np.load(caches[-1])
        times_s, series = z["times_s"], z["series"].astype(np.float32)

        ia, ib = maximize_bipartite_assignment(det, cat_c, sig_x=25e3, sig_t=15.0)
        ra, rb = maximize_bipartite_assignment(ref_c, cat_c, sig_x=25e3, sig_t=15.0)
        matched = dict(zip(ib.tolist(), ia.tolist()))
        ref_matched = set(rb.tolist())

        rows = []
        print(f"\n=== {day}: {len(matched)}/{len(cat)} matched at "
              f"{args.thresh} (ref {len(ref_matched)}/{len(cat)})")
        for j in range(len(cat)):
            c = cat_c[j]
            d = np.linalg.norm(xq - c[None, :3], axis=1)
            nn = np.argsort(d)[:args.k]
            tm = (times_s >= c[3] - args.t_pad) & (times_s <= c[3] + args.t_pad)
            sc = float(series[np.ix_(nn, np.where(tm)[0])].max()) if tm.any() else np.nan
            if len(det):
                dd = np.linalg.norm(det[:, :2] - c[None, :2], axis=1)
                ddt = np.abs(det[:, 3] - c[3])
                near = int(np.argmin(dd / 25e3 + ddt / 15.0))
                near_km, near_s = float(dd[near]) / 1e3, float(det[near, 3] - c[3])
            else:
                near_km = near_s = np.nan
            is_m = j in matched
            if is_m:
                cls = "matched"
            elif sc >= args.thresh:
                cls = "post-loss"
            elif sc >= 0.2:
                cls = "0.2-thresh"
            else:
                cls = "sub-0.2"
            counts[cls] += 1
            rows.append({
                "usgs_t": float(c[3]), "mag": float(cat[j, 4]),
                "depth_km": float(cat[j, 2] / -1e3), "matched": bool(is_m),
                "ref_matched": bool(j in ref_matched),
                "sweep_score": round(sc, 3), "class": cls,
                "nearest_det_km": round(near_km, 1),
                "nearest_det_dt_s": round(near_s, 1),
            })
            flag = " " if is_m else ("*" if j in ref_matched else "-")
            print(f" {flag} t={c[3]:7.0f} M{cat[j, 4]:.1f} "
                  f"score={sc:5.3f} [{cls:9s}] nearest det "
                  f"{near_km:6.1f} km / {near_s:+6.1f} s "
                  f"{'(ref missed too)' if not is_m and j not in ref_matched else ''}")
        per_day[day] = rows

    print(f"\n=== pooled classes over {len(args.days)} days: {counts}")
    if args.json_out:
        Path(args.json_out).write_text(json.dumps(
            {"thresh": args.thresh, "classes": counts, "days": per_day},
            indent=1))


if __name__ == "__main__":
    main()
