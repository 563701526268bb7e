#!/usr/bin/env python
"""Continuous-day inference CLI — the reference's
``process_continuous_days.py``: one process per day (job-arrayable as
``day_index + offset * offset_increment``).

    python scripts/process_continuous_days.py <root> <pick_file> [--out f.hdf5]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("pick_file")
    ap.add_argument("--config", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--t-start", type=float, default=0.0)
    ap.add_argument("--t-end", type=float, default=86400.0)
    args = ap.parse_args()

    import jax
    from genie_tpu.config import load_config
    from genie_tpu.io import load_checkpoint
    from genie_tpu.models.detector import Detector
    from genie_tpu.train.trainer import init_train_state
    from genie_tpu.workflow import domain_from_project, make_trv, process_day
    from genie_tpu.setup.project import load_project

    cfg = load_config(args.config)
    pj = load_project(args.root, cfg.region.name)
    pinn = Path(args.root) / "Grids" / "travel_time_neural_network_physics_informed_p_s_ver_1.pkl"
    trv = make_trv(cfg, pj["projection"], pinn_path=pinn if pinn.exists() else None)
    ctx, proj, trv = domain_from_project(args.root, cfg, trv=trv)

    model = Detector(scale_rel=cfg.model.scale_rel,
                     kernel_sig_t=cfg.model.kernel_sig_t,
                     use_phase_types=cfg.model.use_phase_types,
                     use_absolute_pos=cfg.model.use_absolute_pos)
    state = init_train_state(model, cfg, ctx, trv.from_cart, jax.random.PRNGKey(0))
    state = load_checkpoint(Path(args.root) / "GNN_TrainedModels" / "ckpt", state)

    out = args.out or (Path(args.root) / "Catalog" /
                       (Path(args.pick_file).stem + "_catalog.hdf5"))
    events = process_day(cfg, ctx, trv, model, state.params, args.pick_file,
                         out, args.t_start, args.t_end)
    print(f"{len(events)} events → {out}")


if __name__ == "__main__":
    main()
