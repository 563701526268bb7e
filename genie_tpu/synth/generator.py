"""On-device synthetic pick/event generator.

TPU-native re-design of ``generate_synthetic_data``
(ref train_GENIE_model.py:483-1234, ~750 LoC of host NumPy — explicitly the
reference's training bottleneck, Code/README.md:56). Everything here is
jax.random + static shapes, so batch generation runs jitted on device and
overlaps with the training step.

Covered mechanisms (ref lines in §):
  * smooth time-varying event/false rates (fftconvolve → FFT conv, :505-538)
  * Poisson event times, uniform positions/magnitudes, gamma shallow depths,
    aftershock clustering (:541-584)
  * per-event moveout truncation from beta mixtures + per-phase Laplace
    threshold jitter + per-pair Gaussian jitter (:596-637)
  * arrival synthesis with correlated P/S velocity bias (:679-697)
  * degradation: missed picks, false picks, coda, network-wide spikes,
    Laplace time noise with excess-noise label overwrite, phase flips
    (:716-861)
  * windowing with preferential sampling near events, random station
    subsets, the global-searchsorted nearest-pick featurization (:865-1095)
  * Gaussian space-time detection labels on grid and query points
    (:1192-1221) and per-pick association labels (:1236-1249)

Static budget: ``max_events`` events/timeline, ``2·max_events·n_sta`` true
pick slots + ``n_false_max`` false slots, ``max_picks`` picks per window.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from genie_tpu.ops.knn import knn_graph


class Timeline(NamedTuple):
    """One T-second synthetic timeline of events and picks (padded)."""

    ev_pos_cart: jnp.ndarray   # (E, 3)
    ev_time: jnp.ndarray       # (E,)
    ev_mag: jnp.ndarray        # (E,)
    ev_mask: jnp.ndarray       # (E,) bool
    pick_t: jnp.ndarray        # (N,) absolute pick times
    pick_sta: jnp.ndarray      # (N,) int32
    pick_phase: jnp.ndarray    # (N,) int32 0/1 (after flips)
    pick_event: jnp.ndarray    # (N,) int32 event id, -1 = false pick
    pick_assoc_ok: jnp.ndarray # (N,) bool — eligible for positive assoc label
    pick_mask: jnp.ndarray     # (N,) bool


class WindowBatch(NamedTuple):
    """Per-window tensors (leading axis n_batch) feeding the Detector."""

    feat: jnp.ndarray          # (B, n_src, n_sta, 4)
    mask: jnp.ndarray          # (B, n_src, n_sta, 4)
    sta_mask: jnp.ndarray      # (B, n_sta) bool — per-window station subset
    sta_nbr: jnp.ndarray       # (B, n_sta, k_sta)
    sta_nbr_valid: jnp.ndarray # (B, n_sta, k_sta)
    grid_idx: jnp.ndarray      # (B,) int32 — which spatial grid
    t_sample: jnp.ndarray      # (B,)
    tpick: jnp.ndarray         # (B, n_pick) window-relative pick times
    ipick: jnp.ndarray         # (B, n_pick)
    phase: jnp.ndarray         # (B, n_pick, 1)
    pick_mask: jnp.ndarray     # (B, n_pick)
    x_query: jnp.ndarray       # (B, n_q, 3) cart
    x_qsrc: jnp.ndarray        # (B, n_qsrc, 3) cart
    tq_sample: jnp.ndarray     # (B, n_qsrc)
    lbl_grid: jnp.ndarray      # (B, n_src, n_t)
    lbl_query: jnp.ndarray     # (B, n_q, n_t)
    lbl_assoc: jnp.ndarray     # (B, n_qsrc, n_pick, 2)


def smooth_rate(key, n_bins: int, tscale_bins: float):
    """Positive smooth random process: |white noise ⊛ Gaussian|, normalized to
    mean 1 (the reference's fftconvolve rate construction, :505-538)."""
    noise = jax.random.normal(key, (n_bins,))
    half = n_bins // 2
    t = jnp.arange(-half, n_bins - half)
    kern = jnp.exp(-0.5 * (t / jnp.maximum(tscale_bins, 1.0)) ** 2)
    kern = jnp.fft.fftshift(kern)
    sm = jnp.real(jnp.fft.ifft(jnp.fft.fft(noise) * jnp.fft.fft(kern)))
    sm = jnp.abs(sm)
    return sm / jnp.maximum(sm.mean(), 1e-9)


def _sample_times_from_rate(key, rate, n: int, T: float):
    """Inverse-CDF sampling of n times from a binned rate process."""
    cdf = jnp.cumsum(rate) / jnp.sum(rate)
    u = jax.random.uniform(key, (n,))
    idx = jnp.searchsorted(cdf, u)
    dt_bin = T / rate.shape[0]
    k2 = jax.random.fold_in(key, 1)
    return idx * dt_bin + jax.random.uniform(k2, (n,)) * dt_bin


def surface_elevation(surface, xy):
    """Bilinear surface elevation (cart z) at ``xy`` (..., 2).

    ``surface`` = (elev (nx, ny), lo (2,), h (2,)) — a rasterized topography
    grid in projected coordinates (see workflow.rasterize_surface)."""
    elev, lo, h = surface
    nx, ny = elev.shape
    fx = jnp.clip((xy[..., 0] - lo[0]) / h[0], 0.0, nx - 1.001)
    fy = jnp.clip((xy[..., 1] - lo[1]) / h[1], 0.0, ny - 1.001)
    i0 = jnp.floor(fx).astype(jnp.int32)
    j0 = jnp.floor(fy).astype(jnp.int32)
    wx = fx - i0
    wy = fy - j0
    e00 = elev[i0, j0]
    e10 = elev[i0 + 1, j0]
    e01 = elev[i0, j0 + 1]
    e11 = elev[i0 + 1, j0 + 1]
    return ((1 - wx) * (1 - wy) * e00 + wx * (1 - wy) * e10
            + (1 - wx) * wy * e01 + wx * wy * e11)


def synthesize_timeline(key, cfg, sta_cart, trv_from_cart, scale_cart, offset_cart,
                        depth_range, n_sta_real: int, surface=None,
                        ref_srcs_cart=None, corr_chol=None):
    """Build one timeline. ``trv_from_cart(sta_cart, src_cart) -> (n_ev,
    n_sta, 2)``; scale/offset define the (padded) Cartesian sampling box.
    ``surface``: optional rasterized topography (elev, lo, h); sampled event
    depths are clamped below the local surface (ref train_GENIE_model.py
    :581-584's topography clip of synthetic sources).
    ``ref_srcs_cart``: optional (n_ref, 3) reference-catalog positions —
    with ``cfg.use_reference_spatial_density``, ``frac_reference_catalog``
    of events are blurred draws from it (ref :551-557).
    ``corr_chol``: optional (n_sta, n_sta) Cholesky factor of the
    station-distance covariance — with ``cfg.use_correlated_noise``,
    arrival noise is spatially correlated across stations with
    travel-time-proportional softplus scales and a per-event bias factor
    (ref simulate_travel_times / sample_correlated_travel_time_noise,
    :331-481)."""
    E = cfg.max_events
    n_sta = sta_cart.shape[0]
    T = cfg.T
    n_bins = int(round(cfg.T / cfg.dt_rate))
    keys = jax.random.split(key, 24)

    # --- events -----------------------------------------------------------
    rate = smooth_rate(keys[0], n_bins, cfg.tscale / cfg.dt_rate)
    lam = cfg.max_rate_events * jax.random.uniform(keys[1], (), minval=0.25, maxval=1.0)
    n_ev = jnp.minimum(jax.random.poisson(keys[2], lam), E)
    ev_mask = jnp.arange(E) < n_ev
    ev_time = _sample_times_from_rate(keys[3], rate, E, T)
    ev_pos = jax.random.uniform(keys[4], (E, 3)) * scale_cart + offset_cart
    if ref_srcs_cart is not None and cfg.use_reference_spatial_density:
        # blurred reference-catalog draws replace a fraction of positions
        # (ref :551-557); out-of-range depths resample uniformly
        kr = jax.random.fold_in(keys[4], 1)
        k_a, k_b, k_c, k_d = jax.random.split(kr, 4)
        idx = jax.random.randint(k_a, (E,), 0, ref_srcs_cart.shape[0])
        cand = ref_srcs_cart[idx] + cfg.spatial_sigma * jax.random.normal(k_b, (E, 3))
        z_bad = (cand[:, 2] < depth_range[0]) | (cand[:, 2] > depth_range[1])
        z_uni = (jax.random.uniform(k_c, (E,))
                 * (depth_range[1] - depth_range[0]) + depth_range[0])
        cand = cand.at[:, 2].set(jnp.where(z_bad, z_uni, cand[:, 2]))
        take = jax.random.uniform(k_d, (E,)) < cfg.frac_reference_catalog
        ev_pos = jnp.where(take[:, None], cand, ev_pos)
    if cfg.use_shallow_sources:
        g = jax.random.gamma(keys[5], 1.5, (E,)) * 6e3
        ev_pos = ev_pos.at[:, 2].set(jnp.clip(depth_range[1] - g, depth_range[0], depth_range[1]))
    ev_mag = jax.random.uniform(keys[6], (E,), minval=-1.0, maxval=7.0)

    if cfg.use_aftershocks:
        # ~10% of events relocate near an earlier event (:567-579)
        is_aft = jax.random.uniform(keys[7], (E,)) < 0.1
        parent = jax.random.randint(keys[8], (E,), 0, jnp.maximum(n_ev, 1))
        off = jax.random.gamma(keys[9], 1.0, (E, 3)) * 2e3 * jax.random.choice(
            jax.random.fold_in(keys[9], 1), jnp.asarray([-1.0, 1.0]), (E, 3))
        ev_pos = jnp.where((is_aft & ev_mask)[:, None], ev_pos[parent] + off, ev_pos)
        ev_time = jnp.where(
            is_aft & ev_mask,
            jnp.clip(ev_time[parent] + jax.random.gamma(keys[10], 1.0, (E,)) * 120.0, 0, T),
            ev_time)

    if surface is not None:
        elev = surface_elevation(surface, ev_pos[:, :2])
        ev_pos = ev_pos.at[:, 2].set(jnp.minimum(ev_pos[:, 2], elev))

    # --- moveout truncation ----------------------------------------------
    d0, d1 = cfg.dist_range
    b1 = jax.random.beta(keys[11], 2.0, 5.0, (E,))
    b2 = jax.random.beta(jax.random.fold_in(keys[11], 1), 1.0, 5.0, (E,))
    mix = jax.random.uniform(jax.random.fold_in(keys[11], 2), (E,)) < 0.5
    max_dist = d0 + (d1 - d0) * jnp.where(mix, b1, b2)
    if cfg.use_extra_nearby_moveouts:
        nearby = jax.random.uniform(keys[12], (E,)) < 0.5
        max_dist = jnp.where(nearby, max_dist * 0.5, max_dist)
    long_range = jax.random.uniform(jax.random.fold_in(keys[12], 1), (E,)) < 0.05
    max_dist = jnp.where(long_range, jnp.minimum(max_dist * 3.0, d1), max_dist)

    dist = jnp.linalg.norm(ev_pos[:, None, :] - sta_cart[None, :, :], axis=-1)  # (E, n_sta)
    lap = jax.random.laplace(keys[13], (E, 2)) * cfg.spc_thresh_rand
    thresh = max_dist[:, None, None] + lap[:, None, :]              # (E, 1, 2)
    pair_jit = jax.random.normal(keys[14], (E, n_sta, 2)) * cfg.spc_random
    has_phase = dist[:, :, None] + pair_jit < thresh                # (E, n_sta, 2)
    sta_valid = jnp.arange(n_sta) < n_sta_real
    has_phase = has_phase & ev_mask[:, None, None] & sta_valid[None, :, None]
    # extra S-wave miss/gain knob (:s_extra)
    if cfg.s_extra != 0.0:
        keep_s = jax.random.uniform(jax.random.fold_in(keys[14], 1), (E, n_sta)) > cfg.s_extra
        has_phase = has_phase.at[:, :, 1].set(has_phase[:, :, 1] & keep_s)

    # --- arrival synthesis -----------------------------------------------
    trv = trv_from_cart(sta_cart, ev_pos)                           # (E, n_sta, 2)
    if corr_chol is not None and cfg.use_correlated_noise:
        # spatially-correlated noise (ref :417-481): per-event bias factor
        # on the moveout, per-station softplus scales ∝ travel time, and a
        # station-distance Cholesky coloring the Gaussian draws
        rel1, rel2, b1, b2, _, sp_beta, sp_shift = cfg.corr_noise_params
        kc = jax.random.fold_in(keys[15], 7)
        k_a, k_b, k_c = jax.random.split(kc, 3)
        bias_val = jax.random.uniform(k_a, (E, 1, 2),
                                      minval=1.0 - b1, maxval=1.0 + b2)
        std_val = jax.random.uniform(k_b, (E, 1, 2),
                                     minval=rel1, maxval=rel1 + rel2)
        trv = trv * bias_val
        beta = 10.0 ** sp_beta
        scale = jax.nn.softplus(beta * (trv * std_val + sp_shift)) / beta
        z = jax.random.normal(k_c, (E, n_sta, 2))
        noise = scale * jnp.einsum("st,etp->esp", corr_chol, z)
    else:
        # correlated P/S systematic velocity bias per event (:679-697)
        zb = jax.random.normal(keys[15], (E, 2))
        corr = 0.5 * (zb[:, 0:1] + zb[:, 1:2])
        bias = cfg.total_bias * 0.5 * (zb + corr)                   # (E, 2)
        trv = trv * (1.0 + bias[:, None, :])
        noise = jax.random.laplace(keys[16], (E, n_sta, 2)) * cfg.sig_t * trv
    t_arr = ev_time[:, None, None] + trv + noise

    # excess-noise picks lose their positive association label (:782-813)
    if cfg.use_stable_association_labels:
        lim = jnp.maximum(cfg.thresh_noise_max * cfg.sig_t * trv, cfg.min_misfit_allowed)
        assoc_ok = jnp.abs(noise) < lim
    else:
        assoc_ok = jnp.ones_like(noise, bool)

    # --- missed picks (global fraction × per-station rate, :716-733) ------
    mf = jax.random.uniform(keys[17], (), minval=cfg.miss_pick_fraction[0],
                            maxval=cfg.miss_pick_fraction[1])
    sta_rate = smooth_rate(keys[18], n_sta, 4.0)  # per-station relative miss rate
    miss_p = jnp.clip(mf * sta_rate[None, :, None], 0.0, 0.95)
    miss = jax.random.uniform(jax.random.fold_in(keys[17], 1), has_phase.shape) < miss_p
    kept = has_phase & ~miss

    # --- coda false picks (attached to true picks, :736-740) -------------
    coda = jax.random.uniform(keys[19], kept.shape) < cfg.coda_rate
    coda = coda & kept
    t_coda = t_arr + jax.random.uniform(
        jax.random.fold_in(keys[19], 1), kept.shape,
        minval=cfg.coda_win[0], maxval=cfg.coda_win[1])

    # --- flatten true + coda picks ---------------------------------------
    def flat(x):
        return x.reshape(-1)
    ev_ids = jnp.broadcast_to(jnp.arange(E)[:, None, None], kept.shape)
    sta_ids = jnp.broadcast_to(jnp.arange(n_sta)[None, :, None], kept.shape)
    ph_ids = jnp.broadcast_to(jnp.arange(2)[None, None, :], kept.shape)

    true_t = flat(t_arr)
    true_sta = flat(sta_ids)
    true_ph = flat(ph_ids)
    true_ev = flat(ev_ids)
    true_ok = flat(assoc_ok & kept)
    true_m = flat(kept)

    coda_t = flat(t_coda)
    coda_m = flat(coda)

    # --- false picks ------------------------------------------------------
    n_true = true_m.sum()
    NF = cfg.n_false_max
    f_rate = smooth_rate(keys[20], n_bins, cfg.tscale / cfg.dt_rate)
    lam_f = jnp.minimum(cfg.max_false_events * n_true, NF)
    n_false = jnp.minimum(jax.random.poisson(jax.random.fold_in(keys[20], 1), lam_f), NF)
    false_t = _sample_times_from_rate(keys[21], f_rate, NF, T)
    false_sta = jax.random.randint(keys[22], (NF,), 0, n_sta_real)
    false_ph = jax.random.randint(jax.random.fold_in(keys[22], 1), (NF,), 0, 2)
    false_m = jnp.arange(NF) < n_false

    # clean-interval carve-out (:748-755): zero the false-pick rate over one
    # random contiguous 10-30% stretch of the window so clutter-free events
    # also appear in training. Masking the drawn picks is equivalent to
    # zeroing the Poisson rate there; spikes (below) are exempt, as the
    # reference appends them after the carve-out.
    if cfg.use_clean_data_interval:
        kc = jax.random.fold_in(keys[21], 7)
        f0, f1 = cfg.clean_interval_frac
        frac = f0 + (f1 - f0) * jax.random.uniform(kc)
        start = jax.random.uniform(jax.random.fold_in(kc, 1)) * (1.0 - frac) * T
        in_clean = (false_t >= start) & (false_t < start + frac * T)
    else:
        in_clean = jnp.zeros((NF,), bool)

    # network-wide spikes (:769-779): relocate some false picks to shared times
    n_spk = cfg.max_num_spikes
    spk_t = jax.random.uniform(keys[23], (n_spk,)) * T
    spk_assign = jax.random.randint(jax.random.fold_in(keys[23], 1), (NF,), 0, jnp.maximum(n_spk, 1))
    in_spike = jax.random.uniform(jax.random.fold_in(keys[23], 2), (NF,)) < 0.1
    spread = jax.random.normal(jax.random.fold_in(keys[23], 3), (NF,)) * cfg.spike_time_spread
    false_t = jnp.where(in_spike, spk_t[spk_assign] + spread, false_t)
    false_m = false_m & (in_spike | ~in_clean)

    pick_t = jnp.concatenate((true_t, coda_t, false_t))
    pick_sta = jnp.concatenate((true_sta, true_sta, false_sta)).astype(jnp.int32)
    pick_ph = jnp.concatenate((true_ph, true_ph, false_ph)).astype(jnp.int32)
    pick_ev = jnp.concatenate(
        (true_ev, -jnp.ones_like(true_ev), -jnp.ones((NF,), true_ev.dtype))).astype(jnp.int32)
    pick_ok = jnp.concatenate((true_ok, jnp.zeros_like(coda_m), jnp.zeros_like(false_m)))
    pick_m = jnp.concatenate((true_m, coda_m, false_m))

    # random phase-type flips, 10-30% of picks (:853-861)
    fl_key = jax.random.fold_in(key, 99)
    flip_frac = jax.random.uniform(jax.random.fold_in(fl_key, 0), (), minval=0.1, maxval=0.3)
    flips = jax.random.uniform(jax.random.fold_in(fl_key, 1), pick_ph.shape) < flip_frac
    pick_ph = jnp.where(flips, 1 - pick_ph, pick_ph)

    return Timeline(ev_pos, ev_time, ev_mag, ev_mask, pick_t, pick_sta,
                    pick_ph, pick_ev, pick_ok, pick_m)


def _nearest_gauss(query_t, sorted_keys, n_valid, sorted_t_offset, kernel_sig_t):
    """exp(-Δt²/2σ²) to the nearest entry of a sorted key array (the
    reference's global-searchsorted trick, :958-1089)."""
    idx = jnp.searchsorted(sorted_keys, query_t)
    cand = jnp.stack((jnp.clip(idx - 1, 0, n_valid - 1),
                      jnp.clip(idx, 0, n_valid - 1)), axis=-1)
    rel = jnp.abs(query_t[..., None] - sorted_t_offset[cand]).min(axis=-1)
    rel = jnp.where(n_valid > 0, rel, 10.0 * kernel_sig_t)
    return jnp.exp(-0.5 * rel**2 / kernel_sig_t**2)


def featurize_window(tpick, ipick, phase, pick_mask, trv_grid, kernel_sig_t,
                     sta_mask):
    """Input features for one window on the dense product layout.

    tpick: (n_pick,) window-relative; trv_grid: (n_src, n_sta, 2).
    Returns (feat, mask) each (n_src, n_sta, 4): channels = nearest-any-pick
    vs theoretical P, vs S; nearest same-phase pick vs P, vs S (:1079-1093).
    """
    # Station-separating offset for the shared sort keys. Must exceed every
    # time in play but stay SMALL: float32 resolution at n_sta·OFF must be
    # far below kernel_sig_t (with OFF=1e5 and 374 stations, keys reach
    # 3.7e7 where f32 eps ≈ 4 s — features at high station indices would be
    # quantized to noise).
    OFF = jnp.maximum(jnp.max(jnp.abs(tpick)), jnp.max(trv_grid)) * 1.25 + 100.0
    n_pick = tpick.shape[0]

    def sorted_keys(valid):
        keys = jnp.where(valid, tpick + OFF * ipick, jnp.inf)
        order = jnp.argsort(keys)
        return keys[order], valid.sum()

    k_any, n_any = sorted_keys(pick_mask)
    k_p, n_p = sorted_keys(pick_mask & (phase[:, 0] < 0.5))
    k_s, n_s = sorted_keys(pick_mask & (phase[:, 0] > 0.5))

    q_p = trv_grid[:, :, 0] + OFF * jnp.arange(trv_grid.shape[1])[None, :]
    q_s = trv_grid[:, :, 1] + OFF * jnp.arange(trv_grid.shape[1])[None, :]

    f0 = _nearest_gauss(q_p, k_any, n_any, k_any, kernel_sig_t)
    f1 = _nearest_gauss(q_s, k_any, n_any, k_any, kernel_sig_t)
    f2 = _nearest_gauss(q_p, k_p, n_p, k_p, kernel_sig_t)
    f3 = _nearest_gauss(q_s, k_s, n_s, k_s, kernel_sig_t)
    feat = jnp.stack((f0, f1, f2, f3), axis=-1)
    feat = feat * sta_mask[None, :, None]
    mask = (jnp.abs(feat) > 0.01).astype(jnp.float32)
    return feat, mask


def featurize_window_rasterized(tpick, ipick, phase, pick_mask, trv_grid,
                                kernel_sig_t, sta_mask, t_lo: float,
                                t_hi: float):
    """The reference's *updated* featurizer (``extract_input_from_data``,
    process_utils.py:460-642): rasterize picks into per-station time series
    (bin ``dt = kernel_sig_t/10``) by scatter-max of Gaussian bumps, then
    gather each (src, sta, phase) pair's value at its theoretical
    travel-time bin.

    Within bin quantization this equals :func:`featurize_window` (the
    shared searchsorted formulation) — the rasterized variant trades exact
    nearest-pick distances for O(n_pick) preprocessing independent of
    n_src; on TPU the searchsorted path is already fully vectorized so this
    exists for parity and for very large query counts. ``t_lo``/``t_hi``
    bound the series (static shape); the ``use_sign_input`` slope-sign
    option is not carried (the main model does not use it).
    """
    kernel_sig_t = float(kernel_sig_t)  # static: sets the bin count
    dt = kernel_sig_t / 10.0
    n_bins = int(np.ceil((t_hi - t_lo) / dt)) + 1
    n_sta = trv_grid.shape[1]
    w = 50                                          # ±5σ at dt = σ/10
    offs = jnp.arange(-w, w + 1)

    def series(valid):
        centers = jnp.round((tpick - t_lo) / dt).astype(jnp.int32)
        bins = centers[:, None] + offs[None, :]                  # (n_pick, 2w+1)
        t_bin = t_lo + bins * dt
        vals = jnp.exp(-0.5 * ((t_bin - tpick[:, None]) / kernel_sig_t) ** 2)
        ok = valid[:, None] & (bins >= 0) & (bins < n_bins)
        flat = jnp.where(ok, ipick[:, None] * n_bins + bins, 0)
        vals = jnp.where(ok, vals, 0.0)
        return jnp.zeros(n_sta * n_bins).at[flat.ravel()].max(
            vals.ravel()).reshape(n_sta, n_bins)

    s_any = series(pick_mask)
    s_p = series(pick_mask & (phase[:, 0] < 0.5))
    s_s = series(pick_mask & (phase[:, 0] > 0.5))

    sta_idx = jnp.arange(n_sta)[None, :]
    def gather(s, ph):
        idx = jnp.clip(jnp.round((trv_grid[:, :, ph] - t_lo) / dt), 0,
                       n_bins - 1).astype(jnp.int32)
        return s[sta_idx, idx]

    feat = jnp.stack((gather(s_any, 0), gather(s_any, 1),
                      gather(s_p, 0), gather(s_s, 1)), axis=-1)
    feat = feat * sta_mask[None, :, None]
    mask = (jnp.abs(feat) > 0.01).astype(jnp.float32)
    return feat, mask


def _gauss_labels(pos_q, t_slice_abs, ev_pos, ev_time, ev_active, sig_x, sig_z, sig_t):
    """max over active events of the separable space-time Gaussian bump
    (ref :1192-1221). pos_q (n, 3) cart; t_slice_abs (n_t,) absolute."""
    d2 = (((pos_q[:, None, :2] - ev_pos[None, :, :2]) / sig_x) ** 2).sum(-1) \
        + ((pos_q[:, None, 2] - ev_pos[None, :, 2]) / sig_z) ** 2   # (n, E)
    sp = jnp.exp(-0.5 * d2)
    tm = jnp.exp(-0.5 * ((t_slice_abs[:, None] - ev_time[None, :]) / sig_t) ** 2)  # (n_t, E)
    val = sp[:, None, :] * tm[None, :, :]                            # (n, n_t, E)
    val = jnp.where(ev_active[None, None, :], val, 0.0)
    return val.max(axis=-1)


def make_windows(key, cfg, tcfg, gcfg, tl: Timeline, sta_cart, grids_cart,
                 trv_grids, scale_cart, offset_cart, interior_mask_fn=None,
                 n_t: int = 9, t_win: float = 10.0, subnetworks=None):
    """Slice a timeline into ``tcfg.n_batch`` training windows.

    grids_cart: (n_grids, n_src, 3); trv_grids: (n_grids, n_src, n_sta, 2).
    Returns a :class:`WindowBatch`. Everything vmapped over windows.
    """
    B = tcfg.n_batch
    n_sta = sta_cart.shape[0]
    n_grids = grids_cart.shape[0]
    n_pick = gcfg.max_picks
    n_q = tcfg.n_spc_query
    n_qsrc = tcfg.n_src_query
    max_t = jnp.max(trv_grids)  # traced upper bound on moveout
    t_slice = jnp.linspace(-t_win / 2.0, t_win / 2.0, n_t)
    k0, k1, k2, k3 = jax.random.split(key, 4)

    # window sample times: preferential near DETECTABLE events, tightly
    # centered (ref train_GENIE_model.py:868-877 draws from
    # src_times_active — the events passing the min_sta/min_pick gate of
    # :826-831 — and sets t_sample = t_active + (2/3)·σ_t·laplace, so the
    # event sits near the label-slice center with label max ≈ 1). Sampling
    # among ALL events uniformly over the window instead leaves half the
    # placements outside label coverage and most below the pick gate,
    # starving the detection heads of positives (measured: 2/8 positive
    # windows at label max 0.66 vs the reference's ~4/8 at ~0.95).
    t_rand = jax.random.uniform(k0, (B,)) * (cfg.T - t_win)
    if cfg.use_preferential_sampling:
        # timeline-level detectability gate (post-miss pick counts)
        E = tl.ev_time.shape[0]
        real = tl.pick_mask & (tl.pick_event >= 0)
        pe = jnp.where(real, tl.pick_event, E)
        n_pick_ev = jax.ops.segment_sum(1.0 * real, pe, num_segments=E + 1)[:-1]
        uniq = jnp.zeros((E + 1, n_sta)).at[pe, tl.pick_sta].max(1.0 * real)
        n_sta_ev = uniq[:-1].sum(axis=1)
        gated = tl.ev_mask & (n_sta_ev >= cfg.min_sta_arrival) & \
            (n_pick_ev >= cfg.min_pick_arrival)
        ev_choice = jax.random.categorical(
            k1, jnp.where(gated, 0.0, -jnp.inf), shape=(B,))
        lap = jax.random.laplace(jax.random.fold_in(k1, 1), (B,))
        t_near = tl.ev_time[ev_choice] + (2.0 / 3.0) * tcfg.src_t_kernel * lap
        use_near = jax.random.uniform(jax.random.fold_in(k1, 2), (B,)) < 0.5
        t_sample = jnp.where(use_near & gated.any(),
                             jnp.clip(t_near, 0, cfg.T - t_win), t_rand)
    else:
        t_sample = t_rand

    grid_idx = jax.random.randint(k2, (B,), 0, n_grids)

    # per-window station subsets: random fraction (n_sta_range, :910-935),
    # or — with probability 1/2 when real subnetworks are provided
    # (fixed_subnetworks, :910-935) — an observed day's station set
    frac = jax.random.uniform(k3, (B,), minval=cfg.n_sta_range[0], maxval=cfg.n_sta_range[1])
    n_keep = jnp.round(frac * n_sta).astype(jnp.int32)
    scores = jax.random.uniform(jax.random.fold_in(k3, 1), (B, n_sta))
    rank = jnp.argsort(jnp.argsort(scores, axis=1), axis=1)
    sta_mask = rank < n_keep[:, None]
    if subnetworks is not None and cfg.fixed_subnetworks:
        subnets = jnp.asarray(subnetworks, bool)       # (n_subnet, n_sta)
        pick_sub = jax.random.randint(jax.random.fold_in(k3, 2), (B,),
                                      0, subnets.shape[0])
        use_sub = jax.random.uniform(jax.random.fold_in(k3, 3), (B,)) < 0.5
        sta_mask = jnp.where(use_sub[:, None], subnets[pick_sub], sta_mask)

    def one_window(kw, t0, g_idx, smask):
        trv_g = trv_grids[g_idx]                                   # (n_src, n_sta, 2)
        # --- window pick selection (pad to n_pick) ------------------------
        t_rel = tl.pick_t - t0
        in_win = tl.pick_mask & (t_rel > -10.0) & (t_rel < t_win + max_t + 10.0)
        in_win = in_win & smask[tl.pick_sta]
        prio = jnp.where(in_win, -jnp.abs(t_rel - t_win / 2), -jnp.inf)
        _, sel = jax.lax.top_k(prio, n_pick)
        pmask = in_win[sel]
        # stable ordering: (station, time) lexsort as the reference (:1129);
        # span-scaled multiplier keeps f32 key resolution well under 1 s
        key_off = t_win + max_t + 40.0
        order = jnp.argsort(jnp.where(pmask, tl.pick_sta[sel] * key_off + t_rel[sel], jnp.inf))
        sel = sel[order]
        pmask = pmask[order]
        tp = jnp.where(pmask, t_rel[sel], 0.0)
        ip = jnp.where(pmask, tl.pick_sta[sel], 0).astype(jnp.int32)
        ph = jnp.where(pmask, tl.pick_phase[sel], 0).astype(jnp.float32)[:, None]
        pev = jnp.where(pmask, tl.pick_event[sel], -1)
        pok = pmask & tl.pick_assoc_ok[sel]

        feat, fmask = featurize_window(tp, ip, ph, pmask, trv_g,
                                       tcfg.src_t_kernel, smask)

        # --- active events in this window (:946-949) ----------------------
        n_sta_pick = jax.ops.segment_sum(
            jnp.ones_like(tp) * pmask, jnp.where(pmask, pev, tl.ev_pos_cart.shape[0]),
            num_segments=tl.ev_pos_cart.shape[0] + 1)[:-1]
        uniq = jnp.zeros((tl.ev_pos_cart.shape[0], n_sta))
        uniq = uniq.at[jnp.where(pmask, pev, tl.ev_pos_cart.shape[0] - 1), ip].max(
            jnp.where(pmask & (pev >= 0), 1.0, 0.0))
        n_sta_uniq = uniq.sum(axis=1)
        active = tl.ev_mask & (n_sta_uniq >= cfg.min_sta_arrival) & \
            (n_sta_pick >= cfg.min_pick_arrival) & \
            (tl.ev_time >= t0 - 2.5 * tcfg.src_t_kernel * 3) & \
            (tl.ev_time <= t0 + t_win + 2.5 * tcfg.src_t_kernel * 3)
        if interior_mask_fn is not None:
            active = active & interior_mask_fn(tl.ev_pos_cart)

        # --- queries ------------------------------------------------------
        kq, kqs, kf = jax.random.split(kw, 3)
        x_query = jax.random.uniform(kq, (n_q, 3)) * scale_cart + offset_cart
        # first slots = EXACT active source positions (ref :1195 overwrites
        # x_query[0:len(lp_srcs)] with the true sources — this is what makes
        # near-1 query labels, the strong detection learning signal)
        E_ = tl.ev_pos_cart.shape[0]
        ev_order0 = jnp.argsort(jnp.where(active, jnp.arange(E_), E_ + jnp.arange(E_)))
        n_exact = min(n_q // 10, E_)
        exact_rows = jnp.arange(n_exact)
        take_exact = exact_rows < active.sum()
        x_query = x_query.at[exact_rows].set(
            jnp.where(take_exact[:, None],
                      tl.ev_pos_cart[ev_order0[exact_rows]],
                      x_query[exact_rows]))
        # 20% focused near active sources (:1193-1211)
        n_foc = n_q // 5
        ev_sel = jax.random.categorical(
            jax.random.fold_in(kq, 1),
            jnp.where(active, 0.0, -jnp.inf), shape=(n_foc,))
        ev_sel = jnp.where(active.any(), ev_sel, 0)
        foc = tl.ev_pos_cart[ev_sel] + 2.0 * jax.random.normal(
            jax.random.fold_in(kq, 2), (n_foc, 3)) * jnp.asarray(
            [tcfg.src_x_kernel, tcfg.src_x_kernel, tcfg.src_depth_kernel])
        # focused rows start AFTER the exact-position rows
        x_query = jnp.where(active.any(),
                            x_query.at[n_exact:n_exact + n_foc].set(foc),
                            x_query)

        # association query sources: true active sources first, rest random
        x_qsrc = jax.random.uniform(kqs, (n_qsrc, 3)) * scale_cart + offset_cart
        tq = jax.random.uniform(jax.random.fold_in(kqs, 1), (n_qsrc,)) * t_win
        E = tl.ev_pos_cart.shape[0]
        act_rank = jnp.argsort(jnp.argsort(~active))  # active events first
        ev_order = jnp.argsort(jnp.where(active, jnp.arange(E), E + jnp.arange(E)))
        n_act = active.sum()
        take = jnp.arange(n_qsrc) < jnp.minimum(n_act, n_qsrc)
        ev_for_q = ev_order[jnp.arange(n_qsrc) % E]
        x_qsrc = jnp.where(take[:, None], tl.ev_pos_cart[ev_for_q], x_qsrc)
        tq = jnp.where(take, tl.ev_time[ev_for_q] - t0, tq)

        # --- labels -------------------------------------------------------
        t_abs = t0 + t_slice
        lbl_grid = _gauss_labels(grids_cart[g_idx], t_abs, tl.ev_pos_cart, tl.ev_time,
                                 active, tcfg.src_x_kernel, tcfg.src_depth_kernel,
                                 tcfg.src_t_kernel)
        lbl_query = _gauss_labels(x_query, t_abs, tl.ev_pos_cart, tl.ev_time,
                                  active, tcfg.src_x_kernel, tcfg.src_depth_kernel,
                                  tcfg.src_t_kernel)

        # association labels (pick_labels_extract_interior_region, :1236-1249)
        ev_of_pick = jnp.where(pok & (pev >= 0), pev, E)  # E → inactive dummy
        ev_active_of_pick = jnp.concatenate((active, jnp.zeros(1, bool)))[ev_of_pick]
        ep = jnp.concatenate((tl.ev_pos_cart, jnp.zeros((1, 3))))[ev_of_pick]      # (n_pick, 3)
        et = jnp.concatenate((tl.ev_time, jnp.zeros(1)))[ev_of_pick] - t0     # (n_pick,)
        d2 = (((x_qsrc[:, None, :2] - ep[None, :, :2]) / tcfg.src_x_arv_kernel) ** 2).sum(-1) \
            + ((x_qsrc[:, None, 2] - ep[None, :, 2]) / tcfg.src_depth_kernel) ** 2
        w = jnp.exp(-0.5 * d2) * jnp.exp(-0.5 * ((tq[:, None] - et[None, :]) / tcfg.src_t_arv_kernel) ** 2)
        w = w * ev_active_of_pick[None, :]
        lbl_assoc = jnp.stack((w * (ph[:, 0] < 0.5)[None, :],
                               w * (ph[:, 0] > 0.5)[None, :]), axis=-1)

        return (feat, fmask, tp, ip, ph, pmask, x_query, x_qsrc, tq,
                lbl_grid, lbl_query, lbl_assoc)

    keys_w = jax.random.split(jax.random.fold_in(key, 7), B)
    outs = jax.vmap(one_window)(keys_w, t_sample, grid_idx, sta_mask)
    (feat, fmask, tp, ip, ph, pmask, x_query, x_qsrc, tq,
     lbl_grid, lbl_query, lbl_assoc) = outs

    # per-window station graphs (masked kNN)
    def sta_graph(smask):
        return knn_graph(sta_cart / 1000.0, gcfg.k_sta_edges, mask=smask)
    sta_nbr, sta_nbr_valid = jax.vmap(sta_graph)(sta_mask)

    return WindowBatch(
        feat=feat, mask=fmask, sta_mask=sta_mask, sta_nbr=sta_nbr,
        sta_nbr_valid=sta_nbr_valid, grid_idx=grid_idx, t_sample=t_sample,
        tpick=tp, ipick=ip, phase=ph, pick_mask=pmask, x_query=x_query,
        x_qsrc=x_qsrc, tq_sample=tq, lbl_grid=lbl_grid, lbl_query=lbl_query,
        lbl_assoc=lbl_assoc,
    )
