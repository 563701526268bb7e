#!/usr/bin/env python
"""CPU smoke of the real-data post-processing chain (no TPU, no real day
processing): fabricate a plausible NC day catalog (events near the USGS
day-2017-274 epicentres with PINN-consistent picks), then drive
``nc_calibrate`` and ``nc_relocate`` against it end-to-end.

This is the harness that caught the nc_calibrate pick-index bug (pick
indices must resolve against the catalog file's own saved pick arrays, not
re-derived day arrays). Run before a campaign to verify the glue:

    JAX_PLATFORMS=cpu PYTHONPATH= PALLAS_AXON_POOL_IPS= \
        python scripts/nc_chain_smoke.py [workdir]

Expected: calibrate collects ~24 picks/event and reports a sub-second
before-residual; relocate recovers a large fraction of the planted ~2 km
perturbation (both fail loudly otherwise).
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from nc_common import PROJECT_ROOT, load_day, nc_config, nc_projection


def fabricate_catalog(workdir: Path, n_events: int = 20, seed: int = 0):
    import jax.numpy as jnp
    from genie_tpu.infer.pipeline import CatalogEvent
    from genie_tpu.io import save_catalog
    from genie_tpu.workflow import make_trv

    cfg, sta_lla = nc_config()
    proj = nc_projection(cfg)
    trv = make_trv(cfg, proj, pinn_path=PROJECT_ROOT / "Grids" / "pinn_nc.pkl")
    sta_cart = np.asarray(proj.to_cart_np(sta_lla), np.float32)
    *_, cat, _ = load_day("2017_274")
    rng = np.random.default_rng(seed)
    events, all_pt, all_ps = [], [], []
    for i in range(n_events):
        lla = cat[i % len(cat), :3].copy()
        lla[:2] += rng.normal(0, 0.02, 2)  # ~2 km planted location error
        pos = np.asarray(proj.to_cart_np(lla[None]))[0].astype(np.float32)
        t0 = float(cat[i % len(cat), 3] + rng.normal(0, 1.0)
                   + (i // len(cat)) * 600.0)
        near = np.argsort(np.linalg.norm(sta_cart - pos, axis=1))[:12]
        tt = np.asarray(trv.from_cart(jnp.asarray(sta_cart[near]),
                                      jnp.asarray(pos[None])))[0]  # (12, 2)
        picks, phases = [], []
        for j in range(len(near)):
            for ph in (0, 1):
                all_pt.append(t0 + float(tt[j, ph]) + rng.normal(0, 0.15))
                all_ps.append(int(near[j]))
                picks.append(len(all_pt) - 1)
                phases.append(ph)
        events.append(CatalogEvent(
            pos_cart=pos, time=t0, mag=float(cat[i % len(cat), 4]),
            picks=np.array(picks), pick_phases=np.array(phases)))
    save_catalog(workdir / "catalog_2017_274.hdf5", events,
                 pick_t=np.array(all_pt, np.float32),
                 pick_sta=np.array(all_ps))
    return len(events)


def main():
    workdir = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/tmp/nc_chain_smoke")
    workdir.mkdir(parents=True, exist_ok=True)
    run6 = PROJECT_ROOT / "run6"
    for f in ("config.yaml", "params.pkl"):
        (workdir / f).write_bytes((run6 / f).read_bytes())
    n = fabricate_catalog(workdir)
    print(f"[smoke] fabricated catalog with {n} events", flush=True)

    here = Path(__file__).parent
    cal = subprocess.run(
        [sys.executable, str(here / "nc_calibrate.py"), "--run", str(workdir),
         "--days", "2017_274", "--steps", "200"],
        capture_output=True, text=True)
    print(cal.stdout[-2000:], flush=True)
    assert cal.returncode == 0, cal.stderr[-2000:]
    stats = json.loads([l for l in cal.stdout.splitlines()
                        if l.startswith("{")][-1])
    assert stats["n_picks"] >= 20 * stats["n_events"] * 0.8, stats
    assert stats["resid_before_s"] < 2.0, stats  # pick indices resolve

    rel = subprocess.run(
        [sys.executable, str(here / "nc_relocate.py"), "--run", str(workdir),
         "--day", "2017_274", "--steps", "400", "--graphs", "6",
         "--graph-size", "16", "--use-reference"],
        capture_output=True, text=True)
    print(rel.stdout[-2000:], flush=True)
    assert rel.returncode == 0, rel.stderr[-2000:]
    out = json.loads([l for l in rel.stdout.splitlines()
                      if l.startswith("{")][-1])
    assert out["relocated_epi_err_m"] < out["initial_epi_err_m"], out
    print("[smoke] chain OK", flush=True)


if __name__ == "__main__":
    main()
