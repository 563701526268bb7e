"""Travel-time engine: callable surrogates mapping (stations, sources) to
P/S first-arrival times.

The framework-wide contract mirrors the reference's ``trv`` closure
(utils.py:797-873): ``trv(sta_lla, src_lla) -> (n_src, n_sta, 2)`` seconds,
plus a ``pairwise`` row-wise variant. Implementations:

  * :class:`HomogeneousTravelTime` — straight-ray ‖Δx‖/v (the reference's
    homogeneous fallback, calculate_travel_times_3D_train_model.py:603-605);
    exact for the tiny-synthetic parity config and the training smoke path.
  * :class:`GridTravelTime` — trilinear interpolation over a precomputed
    regular (lat, lon, depth) table per station (utils.py:501-598), as used
    when ``train_travel_time_neural_network: False``.
  * The physics-informed neural surrogate lives in
    ``genie_tpu.models.travel_time_pinn`` (TravelTimesPN/VModel twins).

All are pure-JAX, differentiable (GraphDD and location gradients flow through
them), and vmap/jit-safe.
"""

from __future__ import annotations

from typing import Protocol

import jax
import jax.numpy as jnp
import flax.linen as nn

from genie_tpu.geometry import Projection


class TravelTime(Protocol):
    def __call__(self, sta_lla, src_lla): ...
    def pairwise(self, sta_lla, src_lla): ...


class HomogeneousTravelTime:
    """t = ‖x_src − x_sta‖ / v for constant vp, vs."""

    def __init__(self, projection: Projection, vp: float = 5500.0, vs: float = 3100.0):
        self.proj = projection
        self.vp = vp
        self.vs = vs

    def from_cart(self, sta_cart, src_cart):
        d = jnp.linalg.norm(src_cart[:, None, :] - sta_cart[None, :, :], axis=-1)
        return jnp.stack((d / self.vp, d / self.vs), axis=-1)

    def __call__(self, sta_lla, src_lla):
        return self.from_cart(self.proj.to_cart(sta_lla), self.proj.to_cart(src_lla))

    def pairwise(self, sta_lla, src_lla):
        sta_c = self.proj.to_cart(sta_lla)
        src_c = self.proj.to_cart(src_lla)
        d = jnp.linalg.norm(src_c - sta_c, axis=-1)
        return jnp.stack((d / self.vp, d / self.vs), axis=-1)


class GridTravelTime:
    """Trilinear interpolation of per-station travel-time tables on a regular
    (lat, lon, depth) grid. Ref: utils.py:501-598
    (interp_1D_velocity_model_to_3D_travel_times / 'direct' path).

    ``table``: (n_sta, n_lat, n_lon, n_dep, 2); axes give the grid vectors.
    """

    def __init__(self, table, lats, lons, deps):
        self.table = jnp.asarray(table)
        self.lats = jnp.asarray(lats)
        self.lons = jnp.asarray(lons)
        self.deps = jnp.asarray(deps)

    def _interp(self, src_lla, sta_idx):
        # src_lla: (n_src, 3); sta_idx: () or (n,) station selector
        def axis_locate(vals, grid):
            i = jnp.clip(jnp.searchsorted(grid, vals) - 1, 0, grid.shape[0] - 2)
            w = (vals - grid[i]) / (grid[i + 1] - grid[i])
            return i, jnp.clip(w, 0.0, 1.0)

        ia, wa = axis_locate(src_lla[:, 0], self.lats)
        ib, wb = axis_locate(src_lla[:, 1], self.lons)
        ic, wc = axis_locate(src_lla[:, 2], self.deps)
        t = self.table[sta_idx]  # (n_lat, n_lon, n_dep, 2)

        out = 0.0
        for da, fa in ((0, 1 - wa), (1, wa)):
            for db, fb in ((0, 1 - wb), (1, wb)):
                for dc, fc in ((0, 1 - wc), (1, wc)):
                    out = out + (fa * fb * fc)[:, None] * t[ia + da, ib + db, ic + dc]
        return out

    def __call__(self, sta_lla, src_lla, sta_indices=None):
        n_sta = self.table.shape[0] if sta_indices is None else len(sta_indices)
        idxs = jnp.arange(n_sta) if sta_indices is None else jnp.asarray(sta_indices)
        out = jax.vmap(lambda i: self._interp(src_lla, i))(idxs)  # (n_sta, n_src, 2)
        return jnp.transpose(out, (1, 0, 2))

    def pairwise(self, sta_lla, src_lla, sta_indices=None):
        idxs = (jnp.arange(src_lla.shape[0]) if sta_indices is None
                else jnp.asarray(sta_indices))
        return jax.vmap(lambda s, i: self._interp(s[None], i)[0])(src_lla, idxs)


class _ReluMLP(nn.Module):
    """3×80 ReLU MLP head (the reference's fc1..fc4 Sequentials)."""

    n_out: int = 1
    n_hidden: int = 80

    @nn.compact
    def __call__(self, x):
        for _ in range(3):
            x = nn.relu(nn.Dense(self.n_hidden)(x))
        return nn.Dense(self.n_out)(x)


class LegacyTravelTimes(nn.Module):
    """The legacy two-branch travel-time surrogate with validity-mask heads.
    Ref: module.py:1190-1321 (TravelTimes) — time = tscale·(fc1(relative
    offset) + fc2(absolute positions)), valid-prediction gate =
    sigmoid(fc3(relative) + fc4(absolute)); ``train`` randomly drops the
    absolute branch (p=0.5) so the relative-offset model stays accurate
    stand-alone outside the sampled source region (ref forward_train /
    forward_mask_train), and ``relative=True`` uses only the fc1/fc3
    branches (ref forward_relative / forward_mask_relative — the path used
    when not physics-informed).

    Inputs are Cartesian and pre-scaled by ``scale_val`` internally; output
    shape (n_src, n_sta, n_phases)."""

    n_phases: int = 2
    scale_val: float = 1e6
    trav_val: float = 200.0

    @nn.compact
    def __call__(self, sta_cart, src_cart, train: bool = False,
                 relative: bool = False, drop_p: float = 0.5, rng=None):
        sta = sta_cart / self.scale_val
        src = src_cart / self.scale_val
        rel = sta[None, :, :] - src[:, None, :]                # (S, n_sta, 3)
        absq = jnp.concatenate(
            (jnp.broadcast_to(sta[None], rel.shape),
             jnp.broadcast_to(src[:, None], rel.shape)), axis=-1)
        t = _ReluMLP(self.n_phases, name="fc1")(rel)
        m = _ReluMLP(self.n_phases, name="fc3")(rel)
        if not relative:
            t_abs = _ReluMLP(self.n_phases, name="fc2")(absq)
            m_abs = _ReluMLP(self.n_phases, name="fc4")(absq)
            if train:
                if rng is None:
                    rng = self.make_rng("dropout")
                keep = (jax.random.uniform(rng, rel.shape[:2] + (1,))
                        > drop_p).astype(t.dtype)
                t_abs = t_abs * keep
                m_abs = m_abs * keep
            t = t + t_abs
            m = m + m_abs
        return self.trav_val * t, jax.nn.sigmoid(m)
