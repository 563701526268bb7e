#!/usr/bin/env python
"""Score the reference GENIE's own shipped detections (``srcs_trv`` in
``BSSA/Datasets/.../Sources/*.hdf5``) against the USGS M>1 catalog for every
day of the "100 continuous days" benchmark — the baseline our per-day eval
JSONs compare to (same matcher, sig_x=25 km, sig_t=15 s, as
``nc_process.score``; ref matching machinery: process_utils.py:1463-1540,
rate tables: apply_calibration_routines.py:317-336).

Pure host I/O + the exact bipartite matcher: runs on CPU in ~a minute.

    JAX_PLATFORMS=cpu PYTHONPATH= PALLAS_AXON_POOL_IPS= \
        python scripts/ref_baseline_100days.py [--json-out FILE]
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from nc_common import list_days, load_day, nc_config, nc_projection


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="100")
    ap.add_argument("--sig-x", type=float, default=25e3)
    ap.add_argument("--sig-t", type=float, default=15.0)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    from genie_tpu.calibration.corrections import matched_catalog_stats

    cfg, _ = nc_config()
    proj = nc_projection(cfg)

    per_day = {}
    tot = {"n_usgs": 0, "n_det": 0, "n_matched": 0}
    bins = {m: [0, 0] for m in (1.0, 2.0, 3.0, 4.0)}  # [matched, total]
    for day in list_days(args.dataset):
        try:
            *_, cat, ref = load_day(day, dataset=args.dataset)
        except Exception as e:  # a malformed day shouldn't kill the table
            per_day[day] = {"error": f"{type(e).__name__}: {e}"}
            continue
        if cat is None or ref is None or not len(cat):
            per_day[day] = {"error": "missing cat/srcs_trv"}
            continue
        cat_c = np.concatenate((np.asarray(proj.to_cart_np(cat[:, :3])),
                                cat[:, 3:4]), axis=1)
        ref_c = np.concatenate((np.asarray(proj.to_cart_np(ref[:, :3])),
                                ref[:, 3:4]), axis=1)
        st = matched_catalog_stats(ref_c, cat_c, sig_x=args.sig_x,
                                   sig_t=args.sig_t, mags_ref=cat[:, 4])
        row = {"n_usgs": int(len(cat_c)), "n_det": int(st["n_detected"]),
               "n_matched": int(st["n_matched"]),
               "rate": round(float(st["detection_rate"]), 3)}
        per_day[day] = row
        tot["n_usgs"] += row["n_usgs"]
        tot["n_det"] += row["n_det"]
        tot["n_matched"] += row["n_matched"]
        for m in bins:
            k = f"n_matched_M{m:g}"
            if k in st:
                bins[m][0] += int(st[k])
                bins[m][1] += int(st[f"n_reference_M{m:g}"])

    pooled = {
        "days": sum(1 for v in per_day.values() if "error" not in v),
        **tot,
        "pooled_rate": round(tot["n_matched"] / max(tot["n_usgs"], 1), 4),
        "per_mag_bin": {f"M>={m:g}": {"matched": b[0], "total": b[1],
                                      "rate": round(b[0] / max(b[1], 1), 4)}
                        for m, b in bins.items()},
    }
    out = {"pooled": pooled, "per_day": per_day}
    print(json.dumps(pooled, indent=1), flush=True)
    if args.json_out:
        Path(args.json_out).write_text(json.dumps(out, indent=1))
        print(f"saved {args.json_out}", flush=True)


if __name__ == "__main__":
    main()
