#!/usr/bin/env python
"""Summarize nc_process eval JSONs into a markdown table.

    python scripts/nc_summarize.py projects/NC_EHZ/run4_pref/eval_*.json
"""

import json
import sys
from pathlib import Path


def main():
    json_out = None
    args = sys.argv[1:]
    if "--json-out" in args:
        i = args.index("--json-out")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    rows = []
    for f in args:
        data = json.loads(Path(f).read_text())
        for day, per_th in data.items():
            for th, r in sorted(per_th.items(), key=lambda kv: float(kv[0])):
                rows.append((day, float(th), r))
    print("| day | thresh | USGS M>1 | detected | matched | det rate | "
          "ref rate | epi err (km) | t err (s) | mag resid | n dets total |")
    print("|---|---|---|---|---|---|---|---|---|---|---|")
    for day, th, r in rows:
        epi = r.get("epi_err_m")
        epi = f"{epi / 1e3:.1f}" if epi is not None else "-"
        terr = r.get("t_err_s")
        terr = f"{terr:.1f}" if terr is not None else "-"
        mag = r.get("mag_resid_median")
        mag = f"{mag:+.2f}±{r.get('mag_resid_mad', 0):.2f}" if mag is not None else "-"
        print(f"| {day} | {th} | {r['n_usgs']} | {r['n_detected']} | "
              f"{r['n_matched']} | {r['detection_rate']:.2f} | "
              f"{r['ref_detection_rate']:.2f} | {epi} | {terr} | {mag} | "
              f"{r.get('n_total', '-')} |")

    # pooled multi-day detection-rate-per-magnitude-bin table at each thresh
    # (ref apply_calibration_routines.py:317-336), exact via per-day counts
    by_th = {}
    for day, th, r in rows:
        agg = by_th.setdefault(th, {"n": 0, "m": 0, "rn": 0, "rm": 0,
                                    "bins": {}})
        agg["n"] += r["n_usgs"]
        agg["m"] += r["n_matched"]
        agg["rn"] += r["n_usgs"]
        agg["rm"] += r["ref_n_matched"]
        for mb in ("1", "2", "3", "4"):
            k, nk = f"detection_rate_M{mb}", f"n_usgs_M{mb}"
            if k in r and nk in r:
                b = agg["bins"].setdefault(mb, [0, 0])
                b[0] += round(r[k] * r[nk])
                b[1] += r[nk]
    days_n = len({day for day, _, _ in rows})
    if json_out:
        pooled = {}
        for th, a in sorted(by_th.items()):
            pooled[str(th)] = {
                "n_usgs": a["n"], "n_matched": a["m"],
                "rate": round(a["m"] / max(a["n"], 1), 4),
                "ref_matched": a["rm"],
                "ref_rate": round(a["rm"] / max(a["rn"], 1), 4),
                "per_mag": {f"M>={mb}": {"matched": b[0], "total": b[1],
                                         "rate": round(b[0] / max(b[1], 1), 4)}
                            for mb, b in a["bins"].items()},
            }
        Path(json_out).write_text(json.dumps(
            {"days": sorted({day for day, _, _ in rows}),
             "n_days": days_n, "pooled": pooled}, indent=1))
    if days_n > 1:
        print(f"\n### Pooled over {days_n} days")
        print("| thresh | det rate (all M>1) | ref GENIE rate | "
              "M>=1 | M>=2 | M>=3 | M>=4 |")
        print("|---|---|---|---|---|---|---|")
        for th in sorted(by_th):
            a = by_th[th]
            cells = []
            for mb in ("1", "2", "3", "4"):
                b = a["bins"].get(mb)
                cells.append(f"{b[0]}/{b[1]} ({b[0]/max(b[1],1):.2f})"
                             if b else "-")
            print(f"| {th} | {a['m']}/{a['n']} ({a['m']/max(a['n'],1):.2f}) | "
                  f"{a['rm']}/{a['rn']} ({a['rm']/max(a['rn'],1):.2f}) | "
                  + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
