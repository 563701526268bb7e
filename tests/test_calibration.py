import numpy as np
import jax
import jax.numpy as jnp

from genie_tpu.calibration.corrections import (
    TravelTimeCorrection,
    fit_corrections,
    interp_knn_mean,
    interp_weighted,
    matched_catalog_stats,
)
from genie_tpu.geometry import Projection
from genie_tpu.models.magnitude import MagnitudeModel, fit_magnitude_model
from genie_tpu.models.travel_time import HomogeneousTravelTime


def test_interpolators_constant_field():
    rng = np.random.default_rng(0)
    grid = rng.uniform(-50e3, 50e3, (40, 3)).astype(np.float32)
    coefs = np.full((40, 5, 2), 3.0, np.float32)
    src = rng.uniform(-40e3, 40e3, (7, 3)).astype(np.float32)
    for f in (interp_knn_mean, interp_weighted):
        out = np.asarray(f(jnp.asarray(grid), jnp.asarray(coefs), jnp.asarray(src)))
        assert out.shape == (7, 5, 2)
        assert np.allclose(out, 3.0, atol=1e-5)


def test_fit_corrections_recovers_station_bias():
    """Observed times = base + constant per-station bias → corrections must
    absorb most of it."""
    rng = np.random.default_rng(1)
    proj = Projection.from_center((40.0, -124.0))
    tt = HomogeneousTravelTime(proj)
    n_sta, n_grid, n_ev = 8, 30, 60
    sta = rng.uniform(-50e3, 50e3, (n_sta, 3)).astype(np.float32)
    grid = rng.uniform(-60e3, 60e3, (n_grid, 3)).astype(np.float32)
    src = rng.uniform(-40e3, 40e3, (n_ev, 3)).astype(np.float32)
    true_bias = rng.normal(0, 0.5, (1, n_sta, 2)).astype(np.float32)
    obs = np.asarray(tt.from_cart(jnp.asarray(sta), jnp.asarray(src))) + true_bias
    mask = np.ones_like(obs)
    coefs, loss = fit_corrections(
        jax.random.PRNGKey(0), tt.from_cart, jnp.asarray(sta), grid,
        jnp.asarray(src), jnp.asarray(obs), jnp.asarray(mask),
        n_steps=400, w_smooth=0.1, w_norm=1e-4)
    corr = TravelTimeCorrection(tt.from_cart, grid, coefs)
    pred = np.asarray(corr.from_cart(jnp.asarray(sta), jnp.asarray(src)))
    resid_before = np.abs(np.asarray(tt.from_cart(jnp.asarray(sta), jnp.asarray(src))) - obs).mean()
    resid_after = np.abs(pred - obs).mean()
    assert resid_after < 0.35 * resid_before


def test_magnitude_fit_and_invert():
    rng = np.random.default_rng(2)
    n_sta, n_grid, n_obs = 10, 20, 300
    sta = rng.uniform(-50e3, 50e3, (n_sta, 3)).astype(np.float32)
    sta[:, 2] = 0.0
    grid = rng.uniform(-60e3, 60e3, (n_grid, 3)).astype(np.float32)
    ev = rng.uniform(-40e3, 40e3, (n_obs, 3)).astype(np.float32)
    ev[:, 2] = rng.uniform(-20e3, -2e3, n_obs)
    sta_idx = rng.integers(0, n_sta, n_obs)
    phase = rng.integers(0, 2, n_obs)
    mag = rng.uniform(0.5, 5.0, n_obs).astype(np.float32)
    # synthetic amplitudes from a known law
    d_epi = np.linalg.norm(ev[:, :2] - sta[sta_idx, :2], axis=1)
    log_amp = (1.0 * mag - 1.5 * np.log10(d_epi + 1.0)
               + rng.normal(0, 0.05, n_obs)).astype(np.float32)
    model, params = fit_magnitude_model(
        jax.random.PRNGKey(0), sta, grid, ev, sta_idx, phase, log_amp, mag,
        n_steps=800)
    mag_inv = np.asarray(model.apply(
        params, jnp.asarray(ev), jnp.asarray(sta), jnp.asarray(grid),
        jnp.asarray(sta_idx, jnp.int32), jnp.asarray(phase, jnp.int32),
        log_amp=jnp.asarray(log_amp)))
    err = np.abs(mag_inv - mag)
    assert np.median(err) < 0.25


def test_magnitude_forward_shape_and_roundtrip():
    """Regression: the bias gather must keep the forward (n_obs,) — a mixed
    slice/advanced index once broadcast it to (n_obs, n_obs), silently
    corrupting the fit loss — and inversion must invert the forward exactly."""
    from genie_tpu.models.magnitude import MagnitudeModel

    rng = np.random.default_rng(3)
    n = 9
    src = rng.normal(size=(n, 3)).astype(np.float32) * 1e4
    sta = rng.normal(size=(5, 3)).astype(np.float32) * 1e4
    grid = rng.normal(size=(4, 3)).astype(np.float32) * 1e4
    si = jnp.asarray(rng.integers(0, 5, n), jnp.int32)
    ph = jnp.asarray(rng.integers(0, 2, n), jnp.int32)
    mag = jnp.asarray(rng.uniform(1, 4, n), jnp.float32)
    for k in (1, 3):
        m = MagnitudeModel(n_sta=5, n_grid=4, k=k)
        p = m.init(jax.random.PRNGKey(0), jnp.asarray(src[:2]), jnp.asarray(sta),
                   jnp.asarray(grid), si[:2], ph[:2], mag=mag[:2])
        fwd = m.apply(p, jnp.asarray(src), jnp.asarray(sta), jnp.asarray(grid),
                      si, ph, mag=mag)
        assert fwd.shape == (n,)
        inv = m.apply(p, jnp.asarray(src), jnp.asarray(sta), jnp.asarray(grid),
                      si, ph, log_amp=fwd)
        assert inv.shape == (n,)
        np.testing.assert_allclose(np.asarray(inv), np.asarray(mag), atol=1e-5)


def test_matched_catalog_stats():
    det = np.array([[0, 0, -5e3, 10.0], [50e3, 0, -5e3, 100.0]])
    ref = np.array([[1e3, 0, -5e3, 10.5], [50e3, 1e3, -5e3, 99.5],
                    [0, 90e3, -5e3, 300.0]])
    s = matched_catalog_stats(det, ref, mags_ref=np.array([2.0, 3.0, 1.5]))
    assert s["n_matched"] == 2
    assert abs(s["detection_rate"] - 2 / 3) < 1e-9
    assert s["detection_rate_M2"] == 1.0


def test_interp_scattered_idw():
    from genie_tpu.calibration.corrections import interp_scattered
    pts = np.array([[0., 0, 0], [10e3, 0, 0]], np.float32)
    vals = np.array([1.0, 3.0], np.float32)
    q = np.array([[0., 0, 0], [5e3, 0, 0]], np.float32)
    out = np.asarray(interp_scattered(jnp.asarray(pts), jnp.asarray(vals), jnp.asarray(q), k=2))
    assert abs(out[0] - 1.0) < 1e-3      # at a data point → its value
    assert abs(out[1] - 2.0) < 0.2       # midpoint → average


def test_relocation_benchmark_improves_matched_events():
    """The calibration relocation benchmark (ref
    apply_calibration_routines.py:516-650): DE relocation with the true
    travel-time model must beat perturbed initial locations."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from genie_tpu.calibration.corrections import relocation_benchmark

    rng = np.random.default_rng(0)
    n_sta, n_ev = 14, 6
    sta = rng.uniform(-60e3, 60e3, (n_sta, 3)).astype(np.float32)
    sta[:, 2] = 0.0

    def trv(sta_cart, src_cart):
        d = jnp.linalg.norm(src_cart[:, None] - sta_cart[None], axis=-1)
        return jnp.stack((d / 6000.0, d / 3464.0), axis=-1)

    target = np.concatenate(
        (rng.uniform(-40e3, 40e3, (n_ev, 2)), rng.uniform(-15e3, -5e3, (n_ev, 1)),
         rng.uniform(0, 1000, (n_ev, 1))), axis=1).astype(np.float32)
    init = target + np.concatenate(
        (rng.normal(0, 5e3, (n_ev, 3)), rng.normal(0, 1.0, (n_ev, 1))),
        axis=1).astype(np.float32)

    pick_t, pick_sta, pick_ph, pick_ev = [], [], [], []
    tt = np.asarray(trv(jnp.asarray(sta), jnp.asarray(target[:, :3])))
    for e in range(n_ev):
        for s in range(n_sta):
            for p in (0, 1):
                pick_t.append(target[e, 3] + tt[e, s, p] + rng.normal(0, 0.05))
                pick_sta.append(s)
                pick_ph.append(p)
                pick_ev.append(e)

    out = relocation_benchmark(
        jax.random.PRNGKey(0), trv, sta, init, target,
        np.array(pick_t, np.float32), np.array(pick_sta), np.array(pick_ph, np.float32),
        np.array(pick_ev), bounds_lo=[-70e3, -70e3, -30e3, -30.0],
        bounds_hi=[70e3, 70e3, 0.0, 86400.0 + 30.0],
        grid_cart=target[:2, :3], max_picks=32)
    assert out["relocated"]["horizontal_m"] < 0.5 * out["initial"]["horizontal_m"]
    assert out["relocated"]["time_s"] < out["initial"]["time_s"] + 0.1
    assert "bias_initial" in out
    assert np.all(np.asarray(out["bias_relocated"][:2])
                  <= np.asarray(out["bias_initial"][:2]) + 1e3)
