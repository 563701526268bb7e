"""Travel-time calibration: interpolated station/phase corrections.

TPU-native equivalents of the reference calibration stack
(``calibration_utils.py`` + ``apply_calibration_routines.py``):

  * kNN / Gaussian-weighted / anisotropic interpolators of per-(grid-node,
    station, phase) coefficient fields to arbitrary source positions
    (calibration_utils.py:75-148);
  * :class:`TravelTimeCorrection` wrapping any ``trv`` with interpolated
    corrections (calibration_utils.py:191-255);
  * graph-Laplacian smoothness penalties (random-walk normalized,
    calibration_utils.py:31-54) and :func:`fit_corrections` — Adam on
    MSE(trv + corr, observed arrivals) with Laplacian + norm regularization
    (apply_calibration_routines.py:398-498).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from genie_tpu.ops.knn import knn, knn_graph


def interp_knn_mean(grid_cart, coefs, src_cart, k: int = 5):
    """kNN mean interpolation (Interpolate, :75-95).

    coefs: (n_grid, ...) → (n_src, ...)."""
    idx, _ = knn(grid_cart / 1000.0, src_cart / 1000.0, k)
    return coefs[idx].mean(axis=1)


def interp_weighted(grid_cart, coefs, src_cart, k: int = 5, sig: float = 15e3):
    """Gaussian-weight normalized interpolation (InterpolateWeighted)."""
    idx, _ = knn(grid_cart / 1000.0, src_cart / 1000.0, k)
    d2 = ((src_cart[:, None, :] - grid_cart[idx]) ** 2).sum(-1)
    w = jnp.exp(-0.5 * d2 / sig**2)
    w = w / jnp.maximum(w.sum(axis=1, keepdims=True), 1e-12)
    extra = (1,) * (coefs.ndim - 1)
    return (coefs[idx] * w.reshape(w.shape + extra)).sum(axis=1)


def interp_anisotropic(grid_cart, coefs, src_cart, kernels, k: int = 5):
    """Anisotropic interpolation with learnable per-node 3-axis kernels
    (InterpolateAnisotropic): kernels (n_grid, 3) softplus-scaled widths."""
    idx, _ = knn(grid_cart / 1000.0, src_cart / 1000.0, k)
    sig = jax.nn.softplus(kernels[idx]) + 1e3          # (n_src, k, 3)
    d2 = (((src_cart[:, None, :] - grid_cart[idx]) / sig) ** 2).sum(-1)
    w = jnp.exp(-0.5 * d2)
    w = w / jnp.maximum(w.sum(axis=1, keepdims=True), 1e-12)
    extra = (1,) * (coefs.ndim - 1)
    return (coefs[idx] * w.reshape(w.shape + extra)).sum(axis=1)


def interp_scattered(points, values, query, k: int = 8, p: float = 2.0):
    """Inverse-distance-weighted scattered interpolation (the reference's
    ``NNInterp`` natural-neighbour-style class, process_utils.py:1543-1629,
    unused on its main path but part of the public surface)."""
    idx, _ = knn(points / 1.0, query / 1.0, min(k, points.shape[0]))
    d = jnp.linalg.norm(query[:, None, :] - points[idx], axis=-1)
    w = 1.0 / jnp.maximum(d, 1e-6) ** p
    w = w / w.sum(axis=1, keepdims=True)
    extra = (1,) * (values.ndim - 1)
    return (values[idx] * w.reshape(w.shape + extra)).sum(axis=1)


def rw_laplacian_apply(x, nbr):
    """Random-walk-normalized graph Laplacian: (L x)_i = x_i − mean_j x_j
    over the kNN graph (get_laplacian('rw') twin)."""
    return x - x[nbr].mean(axis=1)


class TravelTimeCorrection:
    """trv wrapper adding interpolated corrections (TrvTimesCorrection)."""

    def __init__(self, base_trv_from_cart, grid_cart, coefs, kernels=None, k: int = 5):
        self.base = base_trv_from_cart
        self.grid_cart = jnp.asarray(grid_cart)
        self.coefs = jnp.asarray(coefs)        # (n_grid, n_sta, 2)
        self.kernels = kernels
        self.k = k

    def _corr(self, src_cart):
        if self.kernels is not None:
            return interp_anisotropic(self.grid_cart, self.coefs, src_cart,
                                      self.kernels, self.k)
        return interp_weighted(self.grid_cart, self.coefs, src_cart, self.k)

    def from_cart(self, sta_cart, src_cart):
        return self.base(sta_cart, src_cart) + self._corr(src_cart)

    def pairwise_from_cart(self, sta_cart, src_cart, sta_idx):
        t = self.base(sta_cart, src_cart)
        corr = self._corr(src_cart)
        return t + corr  # caller slices stations


def fit_corrections(key, base_trv_from_cart, sta_cart, grid_cart, src_cart,
                    obs_times, obs_mask, k_lap: int = 8, n_steps: int = 1000,
                    lr: float = 1e-2, w_smooth: float = 1.0, w_norm: float = 0.1):
    """Fit per-(grid, station, phase) corrections on matched reference events.

    src_cart: (n_ev, 3) reference positions; obs_times/mask: (n_ev, n_sta, 2)
    observed arrivals (origin-corrected). Returns coefs (n_grid, n_sta, 2).
    """
    n_grid = grid_cart.shape[0]
    n_sta = sta_cart.shape[0]
    coefs = jnp.zeros((n_grid, n_sta, 2))
    nbr, _ = knn_graph(jnp.asarray(grid_cart) / 1000.0, min(k_lap, n_grid - 1))
    pred_base = base_trv_from_cart(sta_cart, src_cart)

    def loss_fn(c):
        corr = interp_weighted(jnp.asarray(grid_cart), c, jnp.asarray(src_cart))
        pred = pred_base + corr
        mse = (((pred - obs_times) ** 2) * obs_mask).sum() / jnp.maximum(obs_mask.sum(), 1)
        lap = rw_laplacian_apply(c, nbr)
        return mse + w_smooth * (lap**2).mean() + w_norm * (c**2).mean()

    opt = optax.adam(lr)
    opt_state = opt.init(coefs)

    @jax.jit
    def step(c, s):
        l, g = jax.value_and_grad(loss_fn)(c)
        u, s = opt.update(g, s, c)
        return optax.apply_updates(c, u), s, l

    for _ in range(n_steps):
        coefs, opt_state, l = step(coefs, opt_state)
    return coefs, float(l)


def matched_catalog_stats(srcs_det, srcs_ref, sig_x=15e3, sig_t=5.0,
                          mags_ref=None, mag_bins=(1.0, 2.0, 3.0, 4.0)):
    """Detection rate + residual statistics against a reference catalog via
    optimal bipartite matching — the reference's evaluation machinery
    (apply_calibration_routines.py:317-336). srcs_*: (n, 4) cart+time."""
    from genie_tpu.infer.assign import maximize_bipartite_assignment

    ia, ib = maximize_bipartite_assignment(srcs_det, srcs_ref, sig_x, sig_t)
    stats = {
        "n_detected": len(srcs_det),
        "n_reference": len(srcs_ref),
        "n_matched": len(ia),
        "detection_rate": len(ia) / max(len(srcs_ref), 1),
    }
    if len(ia):
        d = srcs_det[ia] - srcs_ref[ib]
        stats["residual_xy_mean"] = float(np.linalg.norm(d[:, :2], axis=1).mean())
        stats["residual_xy_std"] = float(np.linalg.norm(d[:, :2], axis=1).std())
        stats["residual_z_mean"] = float(np.abs(d[:, 2]).mean())
        stats["residual_t_mean"] = float(np.abs(d[:, 3]).mean())
    if mags_ref is not None:
        for m in mag_bins:
            sel = np.where(mags_ref >= m)[0]
            hit = len(set(sel) & set(ib.tolist()))
            stats[f"detection_rate_M{m:g}"] = hit / max(len(sel), 1)
    return stats
