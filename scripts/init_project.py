#!/usr/bin/env python
"""Project initialization CLI — the reference's ``make_initial_files.py`` +
``assemble_network_data.py`` combined.

    python scripts/init_project.py <project_root> --config cfg.yaml \
        [--stations stations.txt] [--picks picks.txt]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--config", default=None)
    ap.add_argument("--stations", default=None, help="stations.txt path")
    ap.add_argument("--picks", default=None, help="picks.txt to convert")
    ap.add_argument("--catalog", default=None,
                    help="HypoDD-format catalog.txt to convert")
    ap.add_argument("--grid-steps", type=int, default=800)
    args = ap.parse_args()

    from genie_tpu.config import load_config
    from genie_tpu.setup.project import (convert_hypodd_catalog,
                                         convert_picks_txt, init_project)

    cfg = load_config(args.config)
    dirs, proj, grids = init_project(args.root, cfg,
                                     stations_txt=args.stations,
                                     n_steps_grids=args.grid_steps)
    print(f"project '{cfg.region.name}' initialized at {dirs['root']}")
    print(f"grids: {grids.shape}")
    if args.picks:
        import numpy as np
        st = np.load(dirs["root"] / f"{cfg.region.name}_stations.npz",
                     allow_pickle=True)
        days = convert_picks_txt(args.picks, dirs, cfg, st["stas"])
        print(f"converted picks for {len(days)} days")
    if args.catalog:
        import numpy as np
        st = np.load(dirs["root"] / f"{cfg.region.name}_stations.npz",
                     allow_pickle=True)
        days = convert_hypodd_catalog(args.catalog, dirs, cfg, st["stas"], proj)
        print(f"converted catalog for {len(days)} days")


if __name__ == "__main__":
    main()
