"""Graph construction: spatial grids, kNN tables, time pointers, pick pairs.

TPU-native equivalents of the reference's graph machinery:
  * k-means-packed source grids (utils.py:160-497 packing family,
    assemble_network_data.py:121-159) — Lloyd iterations fully on device;
  * station / source kNN graphs (train_GENIE_model.py:1140-1141);
  * travel-time time-pointer tables (utils.py:602-643) — stored as
    per-station ``(n_sta, n_dt, k)`` *source-index* tables, which makes the
    reference's station-subset relabelling arithmetic unnecessary;
  * co-station pick-pair tables for the association attention head
    (replacing the per-station all-pairs edge list of module.py:713-717).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from genie_tpu.ops.knn import knn, knn_graph
from genie_tpu.ops.segment import segment_mean


def kmeans_packing(key, scale_x, offset_x, n_clusters: int, to_cart,
                   weight=None, n_batch: int = 3000, n_steps: int = 1000,
                   lr: float = 0.01):
    """Pack ``n_clusters`` nodes quasi-uniformly over the projected domain by
    stochastic Lloyd iterations (ref utils.py:160-238). Runs jitted on
    device; ``weight`` optionally re-weights Cartesian axes (the reference's
    depth-importance weighting)."""
    scale_x = jnp.asarray(scale_x, jnp.float32).reshape(1, -1)
    offset_x = jnp.asarray(offset_x, jnp.float32).reshape(1, -1)
    w = jnp.ones((1, 3), jnp.float32) if weight is None else jnp.asarray(weight, jnp.float32).reshape(1, -1)

    k0, key = jax.random.split(key)
    v = jax.random.uniform(k0, (n_clusters, 3)) * scale_x + offset_x

    def step(v, k):
        x = jax.random.uniform(k, (n_batch, 3)) * scale_x + offset_x
        vc = to_cart(v) * w
        xc = to_cart(x) * w
        idx, _ = knn(vc, xc, 1)
        ip = idx[:, 0]
        update = segment_mean(x - v[ip], ip, n_clusters)
        return v + lr * update, None

    keys = jax.random.split(key, n_steps)
    v, _ = jax.lax.scan(step, v, keys)
    return v


def kmeans_packing_fit_sources(key, ref_sources_cart, scale_x, offset_x,
                               n_clusters: int, to_cart, blur: float = 15e3,
                               frac_reference: float = 0.5, **kw):
    """Pack nodes around a reference catalog: sampling mixes Gaussian-blurred
    reference source positions with uniform background draws (the reference's
    ``kmeans_packing_fit_sources`` + reference-density sampling,
    utils.py:432-497, train_GENIE_model.py:251-289)."""
    import jax

    ref = jnp.asarray(ref_sources_cart, jnp.float32)

    base_sampler = kw.pop("sampler", None)

    def sampler(k2, n):
        k_a, k_b, k_c, k_d = jax.random.split(k2, 4)
        n_ref = int(frac_reference * n)
        idx = jax.random.randint(k_a, (n_ref,), 0, ref.shape[0])
        pts_ref = ref[idx] + blur * jax.random.normal(k_b, (n_ref, 3))
        pts_uni = jax.random.uniform(k_c, (n - n_ref, 3)) * jnp.asarray(
            scale_x, jnp.float32) + jnp.asarray(offset_x, jnp.float32)
        # uniform points are in lat/lon/depth; reference pts in cart
        return jnp.concatenate((pts_ref, to_cart(pts_uni)), axis=0)

    # Lloyd iterations directly in Cartesian space around the mixture
    n_batch = kw.pop("n_batch", 3000)
    n_steps = kw.pop("n_steps", 1000)
    lr = kw.pop("lr", 0.01)
    k0, key = jax.random.split(key)
    v = sampler(k0, n_clusters)

    def step(v, k2):
        x = sampler(k2, n_batch)
        idx, _ = knn(v, x, 1)
        ip = idx[:, 0]
        update = segment_mean(x - v[ip], ip, n_clusters)
        return v + lr * update, None

    keys = jax.random.split(key, n_steps)
    v, _ = jax.lax.scan(jax.jit(step), v, keys)
    return v


def gaussian_kde_sampler(points, bandwidth: float):
    """Sampler closure drawing from a Gaussian KDE over ``points`` (n, d) —
    equivalent to fitting sklearn ``KernelDensity`` and calling ``.sample``
    (the reference's m_density, utils.py:240-301 + its callers): pick a
    random support point, add N(0, bw)."""
    pts = jnp.asarray(points, jnp.float32)

    def sample(key, n: int):
        k1, k2 = jax.random.split(key)
        idx = jax.random.randint(k1, (n,), 0, pts.shape[0])
        return pts[idx] + bandwidth * jax.random.normal(k2, (n, pts.shape[1]))

    return sample


def kmeans_packing_with_density(key, density_sample, scale_x, offset_x,
                                n_clusters: int, to_cart, weight=None,
                                frac: float = 0.75, n_batch: int = 3000,
                                n_steps: int = 1000, lr: float = 0.01):
    """Density-weighted node packing
    (ref ``kmeans_packing_weight_vector_with_density``, utils.py:240-301):
    ``frac`` of each Lloyd batch is drawn from ``density_sample(key, n) ->
    (n, 2)`` lat/lon samples (z uniform over the depth range), the rest
    uniform over the box; out-of-box density draws are resampled uniformly.
    """
    scale_x = jnp.asarray(scale_x, jnp.float32).reshape(1, -1)
    offset_x = jnp.asarray(offset_x, jnp.float32).reshape(1, -1)
    w = (jnp.ones((1, 3), jnp.float32) if weight is None
         else jnp.asarray(weight, jnp.float32).reshape(1, -1))
    n_dense = int(frac * n_batch)

    def mixture(k2, n, n_d):
        k_a, k_b, k_c = jax.random.split(k2, 3)
        xy = density_sample(k_a, n_d)
        z = (jax.random.uniform(k_b, (n_d, 1)) * scale_x[:, 2:3]
             + offset_x[:, 2:3])
        dense = jnp.concatenate((xy, z), axis=1)
        uni = jax.random.uniform(k_c, (n, 3)) * scale_x + offset_x
        # out-of-box density draws fall back to the uniform draw (ref's
        # iremove resampling)
        lo, hi = offset_x[0, :2], offset_x[0, :2] + scale_x[0, :2]
        ok = jnp.all((dense[:, :2] >= lo) & (dense[:, :2] <= hi), axis=1)
        out = uni.at[:n_d].set(jnp.where(ok[:, None], dense, uni[:n_d]))
        return out

    k0, key = jax.random.split(key)
    v = mixture(k0, n_clusters, int(frac * n_clusters))

    def step(v, k2):
        x = mixture(k2, n_batch, n_dense)
        idx, _ = knn(to_cart(v) * w, to_cart(x) * w, 1)
        ip = idx[:, 0]
        update = segment_mean(x - v[ip], ip, n_clusters)
        return v + lr * update, None

    keys = jax.random.split(key, n_steps)
    v, _ = jax.lax.scan(step, v, keys)
    return v


def kmeans_packing_spherical(key, scale_x, offset_x, n_clusters: int,
                             to_cart, weight=(1.0, 1.0, 2.0),
                             n_batch: int = 3000, n_steps: int = 1000,
                             lr: float = 0.01, izero: float = 0.65):
    """Spherical node packing (ref ``kmeans_packing_spherical``,
    utils.py:342-430): Lloyd batches are randomly-rotated Fibonacci
    lattices on the unit sphere mapped to lat/lon, with depths resampled
    toward the surface by stacked Beta(1,3)/Beta(1,12) draws (the
    reference's ``izero`` shallow bias). Runs jitted on device."""
    from genie_tpu.geometry import ecef2lla, lla2ecef

    scale_x = jnp.asarray(scale_x, jnp.float32).reshape(1, -1)
    offset_x = jnp.asarray(offset_x, jnp.float32).reshape(1, -1)
    w = jnp.asarray(weight, jnp.float32).reshape(1, -1)

    # static unit-sphere Fibonacci lattice (n_batch points)
    def lattice(n):
        i = np.arange(n) + 0.5
        phi = np.arccos(1 - 2 * i / n)
        golden = 2 * np.pi / ((1 + 5**0.5) / 2)
        th = golden * (np.arange(n) + 0.5)
        return jnp.asarray(np.stack((np.cos(th) * np.sin(phi),
                                     np.sin(th) * np.sin(phi),
                                     np.cos(phi)), axis=1), jnp.float32)

    def nodes(k2, base):
        """Random-rotated lattice → (lat, lon) + beta-biased depths."""
        ka, kb, kc, kd, ke = jax.random.split(k2, 5)
        ang = jax.random.uniform(ka, (3,)) * 2 * jnp.pi
        ca, sa = jnp.cos(ang), jnp.sin(ang)
        rx = jnp.array([[1, 0, 0], [0, ca[0], -sa[0]], [0, sa[0], ca[0]]])
        ry = jnp.array([[ca[1], 0, sa[1]], [0, 1, 0], [-sa[1], 0, ca[1]]])
        rz = jnp.array([[ca[2], -sa[2], 0], [sa[2], ca[2], 0], [0, 0, 1]])
        xyz = base @ (rx @ ry @ rz).T
        lla = ecef2lla(xyz, a=1.0, e=0.0)
        n = base.shape[0]
        z = jax.random.uniform(kb, (n,)) * scale_x[0, 2] + offset_x[0, 2]
        for kk, b in ((kc, 3.0), (kd, 12.0)):
            pick = jax.random.uniform(jax.random.fold_in(kk, 1), (n,)) < izero
            zb = ((1.0 - jax.random.beta(kk, 1.0, b, (n,)))
                  * scale_x[0, 2] + offset_x[0, 2])
            z = jnp.where(pick, zb, z)
        return jnp.concatenate((lla[:, :2], z[:, None]), axis=1)

    base = lattice(n_batch)
    k0, key = jax.random.split(key)
    v = nodes(k0, lattice(n_clusters))

    def step(v, k2):
        x = nodes(k2, base)
        idx, _ = knn(to_cart(v) * w, to_cart(x) * w, 1)
        ip = idx[:, 0]
        update = segment_mean(x - v[ip], ip, n_clusters)
        return v + lr * update, None

    keys = jax.random.split(key, n_steps)
    v, _ = jax.lax.scan(step, v, keys)
    return v


def fibonacci_sphere_packing(n: int, radius: float = 6371e3):
    """Fibonacci-lattice points on a sphere (the reference's spherical
    packing initialization, utils.py:342-430)."""
    i = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    golden = np.pi * (1 + 5**0.5)
    theta = golden * i
    return np.stack((radius * np.sin(phi) * np.cos(theta),
                     radius * np.sin(phi) * np.sin(theta),
                     radius * np.cos(phi)), axis=1)


def build_station_graph(sta_cart, k: int, sta_mask=None):
    """Station kNN graph (k=8), distances in km as the reference
    (train_GENIE_model.py:1140: /1000 scaling)."""
    return knn_graph(jnp.asarray(sta_cart) / 1000.0, k, mask=sta_mask)


def build_source_graph(src_cart, k: int):
    """Source-grid kNN graph (k=15)."""
    nbr, _ = knn_graph(jnp.asarray(src_cart) / 1000.0, k)
    return nbr


def build_query_attachment(src_cart, x_query_cart, k: int = 10):
    """kNN of query points into the source grid for SpatialAttention
    (module.py:282: knn on /1000-scaled coordinates)."""
    idx, _ = knn(jnp.asarray(src_cart) / 1000.0, jnp.asarray(x_query_cart) / 1000.0, k)
    return idx


@partial(jax.jit, static_argnames=("k", "n_dt"))
def _time_ptr_one_phase(trv_phase, dt_partition, k: int, n_dt: int):
    # trv_phase: (n_src, n_sta) → per station: k sources nearest each t bin
    d = jnp.abs(trv_phase.T[:, None, :] - dt_partition[None, :, None])  # (n_sta, n_dt, n_src)
    _, idx = jax.lax.top_k(-d, k)
    return idx.astype(jnp.int32)


def build_time_pointers(trv, dt: float = 1.0, k: int = 10, win: float = 10.0,
                        max_t: float | None = None):
    """Per-(station, time-bin) tables of the k source nodes whose theoretical
    travel time is nearest the bin (ref utils.py:602-643). Returns
    ``(ptr_p, ptr_s, dt0, dt, n_dt)`` with ptr_* of shape (n_sta, n_dt, k)
    holding *source* indices."""
    trv = jnp.asarray(trv)
    if max_t is None:
        max_t = float(jnp.max(trv))
    dt_partition = np.arange(-win, win + max_t + dt, dt, dtype=np.float32)
    n_dt = len(dt_partition)
    dt_part = jnp.asarray(dt_partition)
    ptr_p = _time_ptr_one_phase(trv[:, :, 0], dt_part, k, n_dt)
    ptr_s = _time_ptr_one_phase(trv[:, :, 1], dt_part, k, n_dt)
    return ptr_p, ptr_s, float(dt_partition[0]), float(dt), n_dt


@partial(jax.jit, static_argnames=("k_pair",))
def build_pair_table(tpick, ipick, pick_mask, k_pair: int = 16):
    """For every pick, the ``k_pair`` nearest-in-time picks at the same
    station (self included, ranked first), plus one trailing null slot.

    Replaces the reference's per-station itertools-product edge list
    (module.py:713-717): with its 2·eps time sparsification the effective
    fan-in is small, so a fixed nearest-in-time cap is the dense equivalent.
    Returns (pair_idx (n_pick, k_pair+1), pair_valid) — index n_pick = null.
    """
    n_pick = tpick.shape[0]
    same_sta = ipick[:, None] == ipick[None, :]
    both = pick_mask[:, None] & pick_mask[None, :]
    d = jnp.abs(tpick[:, None] - tpick[None, :])
    d = jnp.where(same_sta & both, d, jnp.inf)
    neg, idx = jax.lax.top_k(-d, min(k_pair, n_pick))
    valid = jnp.isfinite(neg)
    idx = jnp.where(valid, idx, n_pick)  # invalid slots point at null (masked)
    null_col = jnp.full((n_pick, 1), n_pick, idx.dtype)
    pair_idx = jnp.concatenate((idx, null_col), axis=1).astype(jnp.int32)
    pair_valid = jnp.concatenate((valid, pick_mask[:, None]), axis=1)
    return pair_idx, pair_valid


def build_edge_feat(src_lla, sta_lla, scale_x_extend):
    """Bipartite read-in/out edge features: (src − sta)/scale in lat/lon/depth
    units (train_GENIE_model.py:1697)."""
    src_lla = jnp.asarray(src_lla)
    sta_lla = jnp.asarray(sta_lla)
    scale = jnp.asarray(scale_x_extend, jnp.float32).reshape(1, 1, 3)
    return (src_lla[:, None, :] - sta_lla[None, :, :]) / scale
