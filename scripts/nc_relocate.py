#!/usr/bin/env python
"""GraphDD relocation of an NC BSSA day catalog produced by nc_process.py
(VERDICT item: relocation on a real produced catalog, with error reported
vs the matched USGS events).

    python scripts/nc_relocate.py --run projects/NC_EHZ/run2 --day 2017_274 \
        --steps 3000
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from nc_common import PROJECT_ROOT, load_day, load_network, nc_config, nc_projection


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default=str(PROJECT_ROOT / "run2"))
    ap.add_argument("--day", default="2017_274")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--graphs", type=int, default=12)
    ap.add_argument("--graph-size", type=int, default=24)
    ap.add_argument("--sta-budget", type=int, default=64)
    ap.add_argument("--use-reference", action="store_true",
                    help="attach matched USGS events as calibration anchors "
                         "(the reference loss, train_double_difference_model"
                         ".py:830-854)")
    args = ap.parse_args()

    import h5py
    import jax
    import jax.numpy as jnp
    from genie_tpu.calibration.corrections import matched_catalog_stats
    from genie_tpu.io import load_catalog
    from genie_tpu.relocation.graphdd import (GNNLocation,
                                              make_relocation_graphs,
                                              relocate, train_graphdd)
    from genie_tpu.workflow import make_trv

    cfg, sta_lla = nc_config()
    proj = nc_projection(cfg)
    sta_cart = np.asarray(proj.to_cart_np(sta_lla), np.float32)
    trv = make_trv(cfg, proj, pinn_path=PROJECT_ROOT / "Grids" / "pinn_nc.pkl")

    cat_f = Path(args.run) / f"catalog_{args.day}.hdf5"
    events = load_catalog(cat_f)
    with h5py.File(cat_f, "r") as f:
        pick_t = np.asarray(f["pick_t"])
        pick_sta = np.asarray(f["pick_sta"])
    S = len(events)
    print(f"{S} catalog events from {cat_f}", flush=True)
    if S < 6:
        print(json.dumps({"error": "too few events to relocate"}))
        return

    n_sta = len(sta_cart)
    src_pos = np.array([ev.pos_cart for ev in events], np.float32)
    src_time = np.array([ev.time for ev in events], np.float32)
    obs = np.zeros((S, n_sta, 2), np.float32)
    msk = np.zeros_like(obs)
    for i, ev in enumerate(events):
        for p, ph in zip(ev.picks, ev.pick_phases):
            obs[i, pick_sta[p], int(ph)] = pick_t[p]
            msk[i, pick_sta[p], int(ph)] = 1.0

    graphs = make_relocation_graphs(
        jax.random.PRNGKey(0), jnp.asarray(src_pos), jnp.asarray(src_time),
        jnp.asarray(obs), jnp.asarray(msk), jnp.asarray(sta_cart),
        n_graphs=args.graphs, graph_size=min(args.graph_size, S),
        sta_budget=args.sta_budget)
    if args.use_reference:
        from genie_tpu.infer.assign import maximize_bipartite_assignment
        from genie_tpu.relocation.graphdd import attach_reference
        *_, cat_m, _ = load_day(args.day)
        usgs_c = np.concatenate((np.asarray(proj.to_cart_np(cat_m[:, :3])),
                                 cat_m[:, 3:4]), axis=1)
        det_m = np.concatenate((src_pos, src_time[:, None]), axis=1)
        ia, ib = maximize_bipartite_assignment(det_m, usgs_c,
                                               sig_x=25e3, sig_t=15.0)
        graphs = [attach_reference(g, ia, usgs_c[ib, :3], usgs_c[ib, 3])
                  for g in graphs]
        print(f"{len(ia)} matched USGS anchors attached", flush=True)
    model = GNNLocation()
    params, loss = train_graphdd(jax.random.PRNGKey(1), model, trv.from_cart,
                                 jnp.asarray(sta_cart), graphs,
                                 n_steps=args.steps)
    print(f"graphdd trained, final loss {loss:.4f}", flush=True)

    # aggregate per-source relocations over all graphs containing the source
    acc = np.zeros((S, 4))
    cnt = np.zeros(S)
    for g in graphs:
        new_pos, new_t, _ = relocate(model, params, trv.from_cart,
                                     jnp.asarray(sta_cart), g)
        ids = np.asarray(g.node_ids)
        m = np.asarray(g.src_mask, bool)
        acc[ids[m], :3] += np.asarray(new_pos)[m]
        acc[ids[m], 3] += np.asarray(new_t)[m]
        cnt[ids[m]] += 1
    got = cnt > 0
    reloc = np.concatenate((src_pos, src_time[:, None]), axis=1).copy()
    reloc[got] = acc[got] / cnt[got, None]
    print(f"{got.sum()}/{S} sources relocated "
          f"(median shift {np.median(np.linalg.norm(reloc[got,:3]-src_pos[got],axis=1)):.0f} m)",
          flush=True)

    # score against matched USGS events, before vs after
    *_, cat, _ = load_day(args.day)
    cat_c = np.concatenate((np.asarray(proj.to_cart_np(cat[:, :3])),
                            cat[:, 3:4]), axis=1)
    det0 = np.concatenate((src_pos, src_time[:, None]), axis=1)
    s0 = matched_catalog_stats(det0, cat_c, sig_x=25e3, sig_t=15.0)
    s1 = matched_catalog_stats(reloc, cat_c, sig_x=25e3, sig_t=15.0)
    out = {
        "n_events": int(S), "n_relocated": int(got.sum()),
        "initial_epi_err_m": s0.get("residual_xy_mean"),
        "relocated_epi_err_m": s1.get("residual_xy_mean"),
        "initial_matched": int(s0["n_matched"]),
        "relocated_matched": int(s1["n_matched"]),
    }
    np.savez(Path(args.run) / f"relocated_{args.day}.npz",
             src_init=det0, src_reloc=reloc)
    (Path(args.run) / f"relocated_{args.day}.json").write_text(
        json.dumps(out, indent=1))
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
