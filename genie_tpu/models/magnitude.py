"""Local-magnitude model.

Flax twin of the reference ``Magnitude`` module (module.py:1590-1692):

  log_amp = Softplus(C1[ph])·M − Softplus(C2[ph])·log10(d_epi + 1)
            + C3[ph]·log10(d_depth + 1) + bias(grid, station, ph)

with the per-(grid-node, station, phase) bias field kNN-interpolated at the
source position. ``forward`` inverts the relation for M given an observed
log-amplitude; ``fit_magnitude_model`` trains (C1, C2, C3, bias) by MSE on
log-amplitudes plus the station-pair differential amplitude loss of
``calibrate_and_apply_magnitude_scale.py:640-713``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np
import optax

from genie_tpu.ops.knn import knn


class MagnitudeModel(nn.Module):
    """Parameters only; geometry passed per call.

    sta_cart: (n_sta, 3); grid_cart: (n_grid, 3) bias support nodes.
    """

    n_sta: int
    n_grid: int
    k: int = 1

    @nn.compact
    def _coefs(self):
        c1 = self.param("mag_coef", lambda k: jnp.ones(2))
        c2 = self.param("epicenter_spatial_coef", lambda k: jnp.ones(2))
        c3 = self.param("depth_spatial_coef", lambda k: jnp.zeros(2))
        bias = self.param("bias", lambda k: jnp.zeros((self.n_grid, self.n_sta, 2)))
        return c1, c2, c3, bias

    def _terms(self, src_cart, sta_cart, grid_cart, sta_idx, phase):
        # src_cart: (n_ev, 3); sta_idx/phase: (n_obs,) pick-aligned with events
        fudge = 1.0
        d_epi = jnp.linalg.norm(src_cart[:, :2] - sta_cart[sta_idx, :2], axis=-1)
        d_dep = jnp.abs(src_cart[:, 2] - sta_cart[sta_idx, 2])
        log_d0 = jnp.log10(d_epi + fudge)
        log_dz = jnp.log10(d_dep + fudge)
        gidx, _ = knn(grid_cart / 1000.0, src_cart / 1000.0, self.k)
        return log_d0, log_dz, gidx

    @nn.compact
    def __call__(self, src_cart, sta_cart, grid_cart, sta_idx, phase, log_amp=None,
                 mag=None):
        """If ``mag`` given → predicted log_amp; if ``log_amp`` given →
        inverted magnitudes. Inputs are per-observation (one source row per
        observation)."""
        c1, c2, c3, bias = self._coefs()
        log_d0, log_dz, gidx = self._terms(src_cart, sta_cart, grid_cart, sta_idx, phase)
        # gather the (grid-node, station, phase) bias at each obs's k nearest
        # grid nodes; all advanced indices broadcast to (n_obs, k) so the
        # result is (n_obs, k) — NOT mixed slice/advanced indexing, which
        # would transpose the k axis out front and silently broadcast the
        # forward to (n_obs, n_obs)
        b = bias[gidx, sta_idx[:, None], phase[:, None]]   # (n_obs, k)
        b = b.mean(axis=1)                                 # (n_obs,)
        a1 = jnp.maximum(jax.nn.softplus(c1[phase]), 1e-12)
        a2 = jax.nn.softplus(c2[phase])
        a3 = c3[phase]
        if mag is not None:
            return mag * a1 - a2 * log_d0 + a3 * log_dz + b
        return (log_amp + a2 * log_d0 - a3 * log_dz - b) / a1


def fit_magnitude_model(key, sta_cart, grid_cart, src_cart, sta_idx, phase,
                        log_amp, mag_obs, k: int = 1, n_steps: int = 2000,
                        lr: float = 1e-2, w_diff: float = 0.5,
                        max_pairs: int = 200_000, w_bias_reg: float = 0.0):
    """Fit the model on observed (source, station, phase, amplitude,
    catalog-magnitude) tuples. Returns (model, params).

    The station-pair differential amplitude loss runs over explicit
    same-event/same-phase pair indices (subsampled to ``max_pairs``), so the
    fit scales to the full observation set instead of an O(n²) pair mask.

    ``w_bias_reg`` penalizes the SPATIAL variation of the (grid, station,
    phase) bias field around its per-station mean: the classic per-station
    ML correction stays free while spatial wiggles — which memorize
    individual training events when the catalog is small (tens of events
    per grid node) — are damped. The reference fits unregularized on a
    catalog orders of magnitude larger
    (calibrate_and_apply_magnitude_scale.py:631-706)."""
    model = MagnitudeModel(n_sta=sta_cart.shape[0], n_grid=grid_cart.shape[0], k=k)
    src_np = np.asarray(src_cart)
    sta_np = np.asarray(sta_idx)
    ph_np = np.asarray(phase)
    src_cart = jnp.asarray(src_cart)
    sta_idx = jnp.asarray(sta_idx, jnp.int32)
    phase = jnp.asarray(phase, jnp.int32)
    log_amp = jnp.asarray(log_amp)
    mag_obs = jnp.asarray(mag_obs)
    sta_cart = jnp.asarray(sta_cart)
    grid_cart = jnp.asarray(grid_cart)

    # same-event (identical source row) + same-phase + distinct-station pairs
    _, ev_lab = np.unique(src_np, axis=0, return_inverse=True)
    pi, pj = [], []
    for e in np.unique(ev_lab):
        idx = np.where(ev_lab == e)[0]
        ii, jj = np.meshgrid(idx, idx, indexing="ij")
        m = (ph_np[ii] == ph_np[jj]) & (sta_np[ii] != sta_np[jj])
        pi.append(ii[m])
        pj.append(jj[m])
    pi = np.concatenate(pi) if pi else np.zeros(0, np.int64)
    pj = np.concatenate(pj) if pj else np.zeros(0, np.int64)
    if len(pi) > max_pairs:
        sel = np.random.default_rng(0).choice(len(pi), max_pairs, replace=False)
        pi, pj = pi[sel], pj[sel]
    pi = jnp.asarray(pi, jnp.int32)
    pj = jnp.asarray(pj, jnp.int32)
    has_pairs = len(pi) > 0

    params = model.init(key, src_cart[:2], sta_cart, grid_cart, sta_idx[:2],
                        phase[:2], mag=mag_obs[:2])

    def loss_fn(p):
        pred = model.apply(p, src_cart, sta_cart, grid_cart, sta_idx, phase,
                           mag=mag_obs)
        mse = ((pred - log_amp) ** 2).mean()
        if not has_pairs:
            return mse
        # station-pair differential amplitude loss: for observations of the
        # same event, differences of log-amps should be magnitude-free
        d_pred = pred[pi] - pred[pj]
        d_obs = log_amp[pi] - log_amp[pj]
        diff = ((d_pred - d_obs) ** 2).mean()
        loss = mse + w_diff * diff
        if w_bias_reg > 0.0:
            b = p["params"]["bias"]
            loss = loss + w_bias_reg * ((b - b.mean(0, keepdims=True)) ** 2).mean()
        return loss

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss_fn)(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    for _ in range(n_steps):
        params, opt_state, l = step(params, opt_state)
    return model, params
