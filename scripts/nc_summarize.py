#!/usr/bin/env python
"""Summarize nc_process eval JSONs into a markdown table.

    python scripts/nc_summarize.py projects/NC_EHZ/run4_pref/eval_*.json
"""

import json
import sys
from pathlib import Path


def main():
    rows = []
    for f in sys.argv[1:]:
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


if __name__ == "__main__":
    main()
