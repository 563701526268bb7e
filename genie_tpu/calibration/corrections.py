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
            # exact per-bin counts so multi-day summaries pool without
            # reconstructing matched counts from a rounded rate
            stats[f"n_matched_M{m:g}"] = hit
            stats[f"n_reference_M{m:g}"] = int(len(sel))
    return stats


def relocation_benchmark(key, trv_from_cart, sta_cart, srcs_init, srcs_target,
                         pick_t, pick_sta, pick_phase, pick_event,
                         bounds_lo, bounds_hi, grid_cart=None,
                         bias_radius: float = 75e3, max_picks: int = 64,
                         popsize: int = 96, n_iter: int = 120):
    """Relocate matched events with a (corrected) travel-time model and
    report the residual + local-bias improvement — the reference's
    calibration relocation benchmark (apply_calibration_routines.py:516-650).

    srcs_init/srcs_target: (n_ev, 4) cart+time (detected vs reference);
    pick_*: flat day-pick arrays with ``pick_event`` giving each pick's event
    index. All events are DE-relocated in one vmapped batch on device, then
    origin times are refined by the per-event median residual (ref :545-564).
    Returns a stats dict with ``srcs_relocated`` and initial/relocated
    residual & bias summaries.
    """
    from genie_tpu.infer.locate import de_minimize, make_location_objective

    srcs_init = np.asarray(srcs_init, np.float32)
    srcs_target = np.asarray(srcs_target, np.float32)
    n_ev = len(srcs_init)
    tp = np.zeros((n_ev, max_picks), np.float32)
    ip = np.zeros((n_ev, max_picks), np.int32)
    ph = np.zeros((n_ev, max_picks, 1), np.float32)
    pm = np.zeros((n_ev, max_picks), bool)
    for e in range(n_ev):
        sel = np.where(np.asarray(pick_event) == e)[0][:max_picks]
        tp[e, :len(sel)] = pick_t[sel]
        ip[e, :len(sel)] = pick_sta[sel]
        ph[e, :len(sel), 0] = pick_phase[sel]
        pm[e, :len(sel)] = True

    lo = jnp.asarray(bounds_lo, jnp.float32)
    hi = jnp.asarray(bounds_hi, jnp.float32)

    @jax.jit
    def locate_all(k):
        def one(k_e, tp_e, ip_e, ph_e, pm_e):
            obj = make_location_objective(trv_from_cart, jnp.asarray(sta_cart),
                                          tp_e, ip_e, ph_e, pm_e, 0.2)
            x, c = de_minimize(obj, lo, hi, k_e, popsize=popsize, n_iter=n_iter)
            # median-residual origin refinement (ref :545-564)
            trv = trv_from_cart(jnp.asarray(sta_cart), x[None, :3])[0]
            t_ph = jnp.take_along_axis(trv[ip_e], ph_e.astype(jnp.int32), 1)[:, 0]
            res = jnp.where(pm_e, x[3] + t_ph - tp_e, jnp.nan)
            shift = jnp.nanmedian(res)
            return jnp.concatenate((x[:3], (x[3] - shift)[None]))

        keys = jax.random.split(k, n_ev)
        return jax.vmap(one)(keys, jnp.asarray(tp), jnp.asarray(ip),
                             jnp.asarray(ph), jnp.asarray(pm))

    srcs_reloc = np.asarray(locate_all(key))

    def summary(a):
        d = a - srcs_target
        return {
            "horizontal_m": float(np.linalg.norm(d[:, :2], axis=1).mean()),
            "vertical_m": float(np.abs(d[:, 2]).mean()),
            "time_s": float(np.abs(d[:, 3]).mean()),
        }

    out = {"srcs_relocated": srcs_reloc,
           "initial": summary(srcs_init), "relocated": summary(srcs_reloc)}

    if grid_cart is not None and n_ev:
        # local bias: mean residual over target events within bias_radius of
        # each grid node (ref :617-650)
        from scipy.spatial import cKDTree
        tree = cKDTree(srcs_target[:, :3])
        groups = tree.query_ball_point(np.asarray(grid_cart), r=bias_radius)
        b1, b2 = [], []
        for g in groups:
            if g:
                b1.append((srcs_init[g, :4] - srcs_target[g, :4]).mean(0))
                b2.append((srcs_reloc[g, :4] - srcs_target[g, :4]).mean(0))
        if b1:
            out["bias_initial"] = np.abs(np.stack(b1)).mean(0).tolist()
            out["bias_relocated"] = np.abs(np.stack(b2)).mean(0).tolist()
    return out
