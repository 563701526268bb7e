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
        b = bias[gidx][:, :, :, :]                     # (n_obs, k, n_sta, 2)
        b = b[jnp.arange(len(sta_idx))[:, None], :, sta_idx[:, None], phase[:, None]]
        b = b.mean(axis=1)                             # (n_obs,)
        a1 = jnp.maximum(jax.nn.softplus(c1[phase]), 1e-12)
        a2 = jax.nn.softplus(c2[phase])
        a3 = c3[phase]
        if mag is not None:
            return mag * a1 - a2 * log_d0 + a3 * log_dz + b
        return (log_amp + a2 * log_d0 - a3 * log_dz - b) / a1


def fit_magnitude_model(key, sta_cart, grid_cart, src_cart, sta_idx, phase,
                        log_amp, mag_obs, k: int = 1, n_steps: int = 2000,
                        lr: float = 1e-2, w_diff: float = 0.5):
    """Fit the model on observed (source, station, phase, amplitude,
    catalog-magnitude) tuples. Returns (model, params)."""
    model = MagnitudeModel(n_sta=sta_cart.shape[0], n_grid=grid_cart.shape[0], k=k)
    src_cart = jnp.asarray(src_cart)
    sta_idx = jnp.asarray(sta_idx, jnp.int32)
    phase = jnp.asarray(phase, jnp.int32)
    log_amp = jnp.asarray(log_amp)
    mag_obs = jnp.asarray(mag_obs)
    sta_cart = jnp.asarray(sta_cart)
    grid_cart = jnp.asarray(grid_cart)

    params = model.init(key, src_cart[:2], sta_cart, grid_cart, sta_idx[:2],
                        phase[:2], mag=mag_obs[:2])

    def loss_fn(p):
        pred = model.apply(p, src_cart, sta_cart, grid_cart, sta_idx, phase,
                           mag=mag_obs)
        mse = ((pred - log_amp) ** 2).mean()
        # station-pair differential amplitude loss: for observations of the
        # same event, differences of log-amps should be magnitude-free
        same_ev = (src_cart[:, None, :] == src_cart[None, :, :]).all(-1)
        same_ph = phase[:, None] == phase[None, :]
        pair_m = same_ev & same_ph & (sta_idx[:, None] != sta_idx[None, :])
        d_pred = pred[:, None] - pred[None, :]
        d_obs = log_amp[:, None] - log_amp[None, :]
        diff = (((d_pred - d_obs) ** 2) * pair_m).sum() / jnp.maximum(pair_m.sum(), 1)
        return mse + w_diff * diff

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
