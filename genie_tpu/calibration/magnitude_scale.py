"""Catalog assembly + magnitude application.

Twin of ``calibrate_and_apply_magnitude_scale.py``: merge daily catalogs
into one project catalog (:422-456), apply the fitted magnitude model
(:764-775 CSV export), and fit the magnitude → association-distance model
(:786-884) used to bound plausible pick-source distances per magnitude.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def merge_daily_catalogs(paths, out_hdf5=None):
    """Concatenate day catalogs (io.save_catalog format) into one list,
    optionally re-saving as a single project hdf5."""
    from genie_tpu.io import load_catalog, save_catalog

    events = []
    for p in sorted(paths):
        events.extend(load_catalog(p))
    if out_hdf5 is not None:
        save_catalog(out_hdf5, events)
    return events


def write_csv_catalog(path, events, projection=None):
    """CSV catalog export (lat, lon, depth_m, time_s, mag, n_picks)."""
    lines = ["lat,lon,depth_m,time_s,mag,n_picks"]
    for ev in events:
        if projection is not None:
            lla = np.asarray(projection.to_lla_np(ev.pos_cart[None]))[0]
        else:
            lla = ev.pos_cart
        mag = ev.mag if ev.mag is not None else float("nan")
        lines.append(f"{lla[0]:.5f},{lla[1]:.5f},{lla[2]:.1f},"
                     f"{ev.time:.3f},{mag:.2f},{len(ev.picks)}")
    Path(path).write_text("\n".join(lines) + "\n")


def apply_magnitudes(events, model, params, sta_cart, grid_cart, pick_sta,
                     pick_amp, projection=None):
    """Assign each event the median inverted magnitude over its picks with
    positive amplitudes (the reference's robust per-event aggregation)."""
    import jax.numpy as jnp

    for ev in events:
        amps = pick_amp[ev.picks]
        ok = amps > 0
        if not ok.any():
            continue
        rows = ev.picks[ok]
        src = np.repeat(ev.pos_cart[None], len(rows), axis=0)
        mags = np.asarray(model.apply(
            params, jnp.asarray(src, jnp.float32), jnp.asarray(sta_cart),
            jnp.asarray(grid_cart), jnp.asarray(pick_sta[rows], jnp.int32),
            jnp.asarray(ev.pick_phases[ok], jnp.int32),
            log_amp=jnp.asarray(np.log10(np.maximum(amps[ok], 1e-12)), jnp.float32)))
        ev.mag = float(np.median(mags))
    return events


def _softplus_dist(m, a, b, c, d0):
    return a * np.log1p(np.exp(np.clip(b * (np.asarray(m) - c), -50, 50))) + d0


def fit_magnitude_distance_params(mags, dists, n_grid: int = 30,
                                  quantile: float = 0.95):
    """Fit the monotone magnitude → max-association-distance relation
    (ref calibrate_and_apply_magnitude_scale.py:786-884: MLP then parametric
    Softplus fit; saved as distance_magnitude_model npz). Here: binned
    ``quantile`` fit with enforced monotonicity + Softplus parametric least
    squares. Returns a picklable params dict for
    :func:`eval_magnitude_distance`."""
    mags = np.asarray(mags)
    dists = np.asarray(dists)
    bins = np.linspace(mags.min(), mags.max() + 1e-6, n_grid)
    centers, qv = [], []
    for lo, hi in zip(bins[:-1], bins[1:]):
        sel = (mags >= lo) & (mags < hi)
        if sel.sum() >= 3:
            centers.append(0.5 * (lo + hi))
            qv.append(np.quantile(dists[sel], quantile))
    centers = np.asarray(centers)
    qv = np.maximum.accumulate(np.asarray(qv))  # enforce monotone

    # parametric: d(m) = a * softplus(b * (m - c)) + d0
    from scipy.optimize import curve_fit

    try:
        p0 = (qv.ptp() if len(qv) else 1e5, 1.0, float(np.median(centers)), qv.min())
        popt, _ = curve_fit(_softplus_dist, centers, qv, p0=p0, maxfev=20000)
        return {"kind": "softplus", "popt": np.asarray(popt, np.float64),
                "centers": centers, "q": qv}
    except Exception:
        return {"kind": "interp", "centers": centers, "q": qv}


def eval_magnitude_distance(params, m):
    """Evaluate the fitted magnitude → max-association-distance curve."""
    if params.get("kind") == "softplus":
        return _softplus_dist(m, *params["popt"])
    return np.interp(np.asarray(m), params["centers"], params["q"])


def fit_magnitude_distance_model(mags, dists, n_grid: int = 30):
    """Callable-returning wrapper around
    :func:`fit_magnitude_distance_params` (kept for API compatibility)."""
    params = fit_magnitude_distance_params(mags, dists, n_grid=n_grid)
    return lambda m: eval_magnitude_distance(params, m)
