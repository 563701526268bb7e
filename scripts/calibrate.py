#!/usr/bin/env python
"""Calibration CLI — the reference's ``apply_calibration_routines.py`` +
``calibrate_and_apply_magnitude_scale.py``: match the produced catalog to a
reference catalog, print detection/residual statistics, fit travel-time
corrections, and fit the magnitude scale.

    python scripts/calibrate.py <root> <catalog.hdf5> <reference.npz>
      where reference.npz has srcs_ref (n, 4: x, y, z cart + t) [+ mags_ref]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("catalog")
    ap.add_argument("reference")
    ap.add_argument("--config", default=None)
    ap.add_argument("--fit-corrections", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from genie_tpu.calibration.corrections import (
        fit_corrections, matched_catalog_stats)
    from genie_tpu.config import load_config
    from genie_tpu.io import load_catalog
    from genie_tpu.workflow import domain_from_project, make_trv
    from genie_tpu.setup.project import load_project

    cfg = load_config(args.config)
    events = load_catalog(args.catalog)
    ref = np.load(args.reference)
    srcs_det = np.array([[*ev.pos_cart, ev.time] for ev in events]).reshape(-1, 4)
    srcs_ref = ref["srcs_ref"]
    stats = matched_catalog_stats(srcs_det, srcs_ref,
                                  mags_ref=ref.get("mags_ref"))
    for k, v in stats.items():
        print(f"{k}: {v}")

    if args.fit_corrections and stats["n_matched"] > 0:
        pj = load_project(args.root, cfg.region.name)
        ctx, proj, trv = domain_from_project(args.root, cfg,
                                             trv=make_trv(cfg, pj["projection"]))
        # observed arrival times at matched reference positions
        from genie_tpu.infer.assign import maximize_bipartite_assignment
        ia, ib = maximize_bipartite_assignment(srcs_det, srcs_ref)
        # build (n_ev, n_sta, 2) obs arrays from the catalog pick lists
        import h5py
        with h5py.File(args.catalog, "r") as f:
            pick_t = np.asarray(f["pick_t"])
            pick_sta = np.asarray(f["pick_sta"])
        n_sta = ctx.sta_cart.shape[0]
        obs = np.zeros((len(ia), n_sta, 2), np.float32)
        msk = np.zeros_like(obs)
        for row, i in enumerate(ia):
            ev = events[i]
            for p, ph in zip(ev.picks, ev.pick_phases):
                obs[row, pick_sta[p], ph] = pick_t[p] - srcs_ref[ib[row], 3]
                msk[row, pick_sta[p], ph] = 1.0
        coefs, loss = fit_corrections(
            jax.random.PRNGKey(0), trv.from_cart, ctx.sta_cart,
            ctx.grids_cart[0], jnp.asarray(srcs_ref[ib, :3], jnp.float32),
            jnp.asarray(obs), jnp.asarray(msk))
        out = Path(args.root) / "Grids" / f"{cfg.region.name}_calibrated_travel_time_corrections_ver_1.npz"
        np.savez(out, coefs=np.asarray(coefs), grid=np.asarray(ctx.grids_cart[0]))
        print(f"corrections fit (loss {loss:.4f}) → {out}")


if __name__ == "__main__":
    main()
