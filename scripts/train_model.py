#!/usr/bin/env python
"""Training CLI — the reference's ``train_GENIE_model.py``.

    python scripts/train_model.py <project_root> [--steps N] [--restart]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--config", default=None)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--restart", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from genie_tpu.config import load_config
    from genie_tpu.workflow import domain_from_project, make_trv, train
    from genie_tpu.setup.project import load_project

    cfg = load_config(args.config)
    pj = load_project(args.root, cfg.region.name)
    pinn = Path(args.root) / "Grids" / "travel_time_neural_network_physics_informed_p_s_ver_1.pkl"
    trv = make_trv(cfg, pj["projection"], pinn_path=pinn if pinn.exists() else None)
    ctx, proj, trv = domain_from_project(args.root, cfg, trv=trv)
    train(cfg, ctx, trv, Path(args.root) / "GNN_TrainedModels",
          n_steps=args.steps, seed=args.seed, restart=args.restart)


if __name__ == "__main__":
    main()
