#!/usr/bin/env python
"""Locate events with the reference's shipped travel-time network — the
script twin of the reference's ``Examples/apply_location.ipynb``.

* Example 1 (ref notebook cell 4): pick a random source in the WestCoast
  region, synthesize arrival times at 60 random stations with the shipped
  trained PINN (transplanted into the JAX ``TravelTimesPN`` — see
  ``tests/test_torch_parity.py::test_reference_pinn_weight_transplant``),
  and recover the source with the vectorized differential-evolution locator.
* Example 2 (ref cell 6): match two catalogs with the optimal bipartite
  space-time matcher. (The notebook's real-event example needs an FDSN
  download — no network egress here, so both catalogs are synthetic.)

Runs on CPU in ~a minute:

    JAX_PLATFORMS=cpu python examples/apply_location.py
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

REF_EX = Path("/root/reference/Examples")


def main():
    import jax
    import jax.numpy as jnp
    from genie_tpu.geometry import lla2ecef_np
    from genie_tpu.infer.assign import maximize_bipartite_assignment
    from genie_tpu.infer.locate import locate_source
    from genie_tpu.models.travel_time_pinn import (TravelTimePN,
                                                   load_reference_pinn)

    rng = np.random.default_rng(7)

    # ---- load the shipped artifacts (stations + trained PINN) -----------
    w = np.load(REF_EX / "WestCoast_stations.npz", allow_pickle=True)
    z = np.load(REF_EX / "travel_time_neural_network_physics_informed_p_s_losses_ver_1.npz")
    r = np.load(REF_EX / "WestCoast_region.npz")
    mn, rbest, locs = w["mn"], w["rbest"], w["locs"]
    ftrns1 = lambda x: (rbest @ (lla2ecef_np(x) - mn).T).T

    model, params, scales = load_reference_pinn(
        REF_EX / "travel_time_neural_network_physics_informed_p_s_ver_1.h5",
        z["scale_params"], z["v_mean"])
    trv = TravelTimePN(model, params, scales)
    print(f"loaded shipped PINN: {locs.shape[0]} stations, "
          f"max_dist {float(scales.x_scale)/1e3:.0f} km")

    # ---- Example 1: locate a synthetic source ---------------------------
    lat_r, lon_r, dep_r = r["lat_range"], r["lon_range"], r["depth_range"]
    # keep the source inside the station cloud so the problem is constrained
    src_lla = np.array([rng.uniform(36.0, 42.0), rng.uniform(-125.0, -119.0),
                        rng.uniform(dep_r[0], 0.0)])
    src_t0 = rng.uniform(-20, 20)
    isel = rng.choice(len(locs), 60, replace=False)
    sta_cart = ftrns1(locs[isel]).astype(np.float32)
    src_cart = ftrns1(src_lla[None]).astype(np.float32)

    tt = np.asarray(trv.from_cart(jnp.asarray(sta_cart), jnp.asarray(src_cart)))[0]
    # one P or S arrival per station, with distance-scaled timing noise
    phase = rng.integers(0, 2, 60)
    t_arr = src_t0 + tt[np.arange(60), phase]
    t_arr += rng.normal(size=60) * 0.015 * (t_arr - src_t0)

    lo = np.concatenate([sta_cart.min(0)[:2] - 100e3, [dep_r[0], t_arr.min() - 300]])
    hi = np.concatenate([sta_cart.max(0)[:2] + 100e3, [dep_r[1], t_arr.min()]])
    pos, t0, cost = locate_source(
        jax.random.PRNGKey(0), trv.from_cart, jnp.asarray(sta_cart),
        jnp.asarray(t_arr, jnp.float32), jnp.arange(60),
        jnp.asarray(phase, jnp.float32)[:, None],
        jnp.ones(60), lo, hi)
    err_xy = np.linalg.norm(np.asarray(pos)[:2] - src_cart[0, :2]) / 1e3
    err_z = abs(float(pos[2]) - src_cart[0, 2]) / 1e3
    err_t = abs(float(t0) - src_t0)
    print(f"Example 1 — DE location: epicentre error {err_xy:.1f} km, "
          f"depth error {err_z:.1f} km, origin-time error {err_t:.2f} s")
    assert err_xy < 15.0 and err_t < 3.0, "location diverged"

    # ---- Example 2: catalog-vs-catalog matching --------------------------
    n_ev = 40
    cat_a = np.column_stack([rng.uniform(-300e3, 300e3, (n_ev, 2)),
                             rng.uniform(-30e3, 0, n_ev),
                             rng.uniform(0, 86400, n_ev)])
    jitter = np.column_stack([rng.normal(0, 5e3, (n_ev, 2)),
                              rng.normal(0, 2e3, n_ev), rng.normal(0, 2.0, n_ev)])
    cat_b = np.concatenate([cat_a[: n_ev // 2] + jitter[: n_ev // 2],
                            cat_a[-5:] + np.array([500e3, 0, 0, 0])])
    ia, ib = maximize_bipartite_assignment(cat_a, cat_b, sig_x=45e3, sig_t=10.0)
    print(f"Example 2 — bipartite catalog match: {len(ia)} of {n_ev // 2} "
          f"overlapping events matched (5 far decoys correctly unmatched)")
    assert len(ia) == n_ev // 2


if __name__ == "__main__":
    if not REF_EX.exists():
        print("reference artifacts not found; nothing to demonstrate")
    else:
        main()
