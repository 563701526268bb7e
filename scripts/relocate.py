#!/usr/bin/env python
"""GraphDD relocation CLI — the reference's ``Relocation/`` stack
(build_initial_files → build_subsets_of_paired_sources →
train_double_difference_model) end-to-end on a produced catalog.

    python scripts/relocate.py <root> <catalog.hdf5> [--steps N]
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
    ap.add_argument("--config", default=None)
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--graphs", type=int, default=20)
    ap.add_argument("--graph-size", type=int, default=32)
    ap.add_argument("--sta-budget", type=int, default=None,
                    help="cap the per-graph observed-station subset")
    ap.add_argument("--dtcc", default=None,
                    help="HypoDD dt.cc file of cross-correlation "
                         "differential times (adds the 0.8-weight loss)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import h5py
    from genie_tpu.config import load_config
    from genie_tpu.io import load_catalog
    from genie_tpu.relocation.graphdd import (
        GNNLocation, attach_dtcc, load_dtcc, make_relocation_graphs,
        relocate, train_graphdd)
    from genie_tpu.workflow import domain_from_project, make_trv
    from genie_tpu.setup.project import load_project

    cfg = load_config(args.config)
    pj = load_project(args.root, cfg.region.name)
    ctx, proj, trv = domain_from_project(args.root, cfg,
                                         trv=make_trv(cfg, pj["projection"]))
    events = load_catalog(args.catalog)
    with h5py.File(args.catalog, "r") as f:
        pick_t = np.asarray(f["pick_t"])
        pick_sta = np.asarray(f["pick_sta"])

    n_sta = ctx.sta_cart.shape[0]
    S = len(events)
    src_pos = np.array([ev.pos_cart for ev in events], np.float32)
    src_time = np.array([ev.time for ev in events], np.float32)
    obs = np.zeros((S, n_sta, 2), np.float32)
    msk = np.zeros_like(obs)
    for i, ev in enumerate(events):
        for p, ph in zip(ev.picks, ev.pick_phases):
            obs[i, pick_sta[p], ph] = pick_t[p]
            msk[i, pick_sta[p], ph] = 1.0

    graphs = make_relocation_graphs(
        jax.random.PRNGKey(0), jnp.asarray(src_pos), jnp.asarray(src_time),
        jnp.asarray(obs), jnp.asarray(msk), ctx.sta_cart,
        n_graphs=args.graphs, graph_size=min(args.graph_size, S),
        sta_budget=args.sta_budget)
    if args.dtcc:
        dtcc = load_dtcc(args.dtcc, pj["sta_names"])
        graphs = [attach_dtcc(g, dtcc) for g in graphs]
        n_att = sum(int(np.asarray(g.dt_mask).sum()) for g in graphs)
        print(f"dt.cc: {len(dtcc['src_a'])} observations, "
              f"{n_att} attached across {len(graphs)} graphs")
    model = GNNLocation()
    params, loss = train_graphdd(jax.random.PRNGKey(1), model, trv.from_cart,
                                 ctx.sta_cart, graphs, n_steps=args.steps)
    print(f"graphdd trained, final loss {loss:.4f}")

    new_pos, new_t, sta_corr = relocate(model, params, trv.from_cart,
                                        ctx.sta_cart, graphs[0])
    out = Path(args.root) / "DoubleDifferenceModels" / "relocated_ver_1.npz"
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez(out, src_pos=np.asarray(new_pos), src_time=np.asarray(new_t),
             sta_corr=np.asarray(sta_corr))
    print(f"relocated sources → {out}")


if __name__ == "__main__":
    main()
