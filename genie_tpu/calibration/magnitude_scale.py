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


def fit_magnitude_distance_model(mags, dists, n_grid: int = 30):
    """Fit the monotone magnitude → max-association-distance relation
    (ref :786-884: MLP then parametric Softplus fit). Here: isotonic-style
    binned quantile fit + Softplus parametric least squares; returns a
    callable dist(mag)."""
    mags = np.asarray(mags)
    dists = np.asarray(dists)
    bins = np.linspace(mags.min(), mags.max() + 1e-6, n_grid)
    centers, q95 = [], []
    for lo, hi in zip(bins[:-1], bins[1:]):
        sel = (mags >= lo) & (mags < hi)
        if sel.sum() >= 3:
            centers.append(0.5 * (lo + hi))
            q95.append(np.quantile(dists[sel], 0.95))
    centers = np.asarray(centers)
    q95 = np.maximum.accumulate(np.asarray(q95))  # enforce monotone

    # parametric: d(m) = a * softplus(b * (m - c)) + d0
    from scipy.optimize import curve_fit

    def f(m, a, b, c, d0):
        return a * np.log1p(np.exp(b * (m - c))) + d0

    try:
        p0 = (q95.ptp() if len(q95) else 1e5, 1.0, float(np.median(centers)), q95.min())
        popt, _ = curve_fit(f, centers, q95, p0=p0, maxfev=20000)
        return lambda m: f(np.asarray(m), *popt)
    except Exception:
        return lambda m: np.interp(np.asarray(m), centers, q95)
