"""GraphDD — GNN double-difference relocation.

TPU-native re-design of the reference ``Relocation/`` stack:

  * :func:`build_catalog_data` — per-pick residuals, travel-time partials
    (``jax.jacfwd`` through the surrogate instead of 4 autograd calls,
    ref build_initial_files.py:716-726), and per-source covariance proxies;
  * :func:`make_relocation_graphs` — static-shape relocation graphs: a seed
    source + its nearest neighbours within ``max_pair_dist`` (the reference's
    3-tier random source graph, build_subsets_of_paired_sources.py:261-409),
    with per-(source, station) 15-dim inputs: P/S residuals, P/S partials
    (3+3), offset vec+norm, log pick count, P/S masks (ref :766-789);
  * :class:`GNNLocation` — 5× edge-featured dual-relation conv over the
    (source × station) product, read out to per-source position/time
    perturbations and per-station P/S static corrections
    (ref train_double_difference_model.py:333-538);
  * :func:`make_dd_loss` — 0.8·double-difference + 0.2·(0.5·absolute +
    0.5·station-mean) L1 losses through the differentiable relocation
    pipeline (ref :841-957), optional EMA memory input (:793-820).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
import flax.linen as nn

from genie_tpu.models.layers import PReLU
from genie_tpu.ops.knn import knn
from genie_tpu.ops.segment import gather_mean_src_axis, gather_mean_sta_axis


class RelocGraph(NamedTuple):
    """One static-shape relocation graph (S sources × n_sta stations)."""

    src_pos: jnp.ndarray     # (S, 3) initial Cartesian positions
    src_time: jnp.ndarray    # (S,) origin times
    src_mask: jnp.ndarray    # (S,) bool
    obs_time: jnp.ndarray    # (S, n_sta, 2) observed arrivals (absolute)
    obs_mask: jnp.ndarray    # (S, n_sta, 2) pick presence
    src_nbr: jnp.ndarray     # (S, k_src) source kNN within the graph
    sta_nbr: jnp.ndarray     # (n_sta, k_sta)
    pair_a: jnp.ndarray      # (n_pairs,) loss-edge source indices
    pair_b: jnp.ndarray      # (n_pairs,)
    pair_mask: jnp.ndarray   # (n_pairs,) bool


def build_catalog_data(trv_from_cart, sta_cart, src_pos, src_time, obs_time, obs_mask):
    """Residuals + partials for a catalog. Returns (resid (S, n_sta, 2),
    partials (S, n_sta, 2, 3))."""
    pred = trv_from_cart(sta_cart, src_pos) + src_time[:, None, None]
    resid = (obs_time - pred) * obs_mask

    def t_of_x(x):
        return trv_from_cart(sta_cart, x[None])[0]  # (n_sta, 2)

    partials = jax.vmap(jax.jacfwd(t_of_x))(src_pos)  # (S, n_sta, 2, 3)
    return resid, partials


def prune_picks(resid, obs_mask, max_resid: float = 2.0, max_rel_resid: float = 0.1,
                trv=None):
    """Drop picks with large (relative) residuals before relocation — the
    reference's relative-error pruning (build_initial_files.py:738-752).
    Returns a cleaned obs_mask."""
    bad = jnp.abs(resid) > max_resid
    if trv is not None:
        bad = bad | (jnp.abs(resid) > max_rel_resid * jnp.maximum(trv, 1.0))
    return obs_mask * (~bad)


def drop_isolated_sources(src_pos, src_mask, obs_mask, min_picks: int = 6,
                          max_nn_dist: float = 50e3):
    """Remove unstable/isolated sources (ref :757-810): too few picks, or no
    neighbour within ``max_nn_dist``. Returns updated src_mask."""
    n_picks = obs_mask.sum(axis=(1, 2))
    d = jnp.linalg.norm(src_pos[:, None] - src_pos[None, :], axis=-1)
    d = jnp.where(jnp.eye(len(src_pos), dtype=bool) | ~src_mask[None, :], jnp.inf, d)
    has_nbr = d.min(axis=1) < max_nn_dist
    return src_mask & (n_picks >= min_picks) & has_nbr


def make_relocation_graphs(key, src_pos, src_time, obs_time, obs_mask, sta_cart,
                           n_graphs: int, graph_size: int = 32, k_src: int = 8,
                           k_sta: int = 8, max_pair_dist: float = 10e3,
                           n_pairs: int = 256):
    """Sample relocation graphs: seed source + nearest neighbours (capped at
    graph_size); loss pairs = close source pairs inside the graph."""
    n_src = src_pos.shape[0]
    rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 2**31 - 1)))
    src_pos_np = np.asarray(src_pos)
    graphs = []
    sta_nbr, _ = knn(jnp.asarray(sta_cart) / 1000.0, jnp.asarray(sta_cart) / 1000.0,
                     min(k_sta + 1, len(sta_cart)))
    sta_nbr = sta_nbr[:, 1:]  # drop self
    for _ in range(n_graphs):
        seed = rng.integers(0, n_src)
        d = np.linalg.norm(src_pos_np - src_pos_np[seed], axis=1)
        order = np.argsort(d)[:graph_size]
        S = len(order)
        pad = graph_size - S
        sel = np.concatenate((order, np.zeros(pad, np.int64)))
        smask = np.arange(graph_size) < S

        pos_g = src_pos_np[sel]
        nbr_idx, _ = knn(jnp.asarray(pos_g) / 1000.0, jnp.asarray(pos_g) / 1000.0,
                         min(k_src + 1, graph_size))
        nbr_idx = np.asarray(nbr_idx)[:, 1:]

        # loss pairs: close pairs within graph
        dd = np.linalg.norm(pos_g[:, None] - pos_g[None, :], axis=-1)
        ii, jj = np.where((dd < max_pair_dist) & (dd > 0)
                          & smask[:, None] & smask[None, :])
        if len(ii) > n_pairs:
            pick = rng.choice(len(ii), n_pairs, replace=False)
            ii, jj = ii[pick], jj[pick]
        pa = np.zeros(n_pairs, np.int64)
        pb = np.zeros(n_pairs, np.int64)
        pmask = np.zeros(n_pairs, bool)
        pa[:len(ii)] = ii
        pb[:len(jj)] = jj
        pmask[:len(ii)] = True

        graphs.append(RelocGraph(
            src_pos=jnp.asarray(pos_g, jnp.float32),
            src_time=jnp.asarray(np.asarray(src_time)[sel], jnp.float32),
            src_mask=jnp.asarray(smask),
            obs_time=jnp.asarray(np.asarray(obs_time)[sel], jnp.float32),
            obs_mask=jnp.asarray(np.asarray(obs_mask)[sel], jnp.float32),
            src_nbr=jnp.asarray(nbr_idx, jnp.int32),
            sta_nbr=jnp.asarray(sta_nbr, jnp.int32),
            pair_a=jnp.asarray(pa, jnp.int32), pair_b=jnp.asarray(pb, jnp.int32),
            pair_mask=jnp.asarray(pmask),
        ))
    return graphs


class _DualConv(nn.Module):
    """Edge-featured dual-relation conv round (the GraphDD DataAggregation
    variant, ref train_double_difference_model.py:333-388)."""

    n_hidden: int = 30

    @nn.compact
    def __call__(self, x, sta_nbr, src_nbr):
        h = self.n_hidden
        a1, a2, a3 = PReLU(), PReLU(), PReLU()
        agg_sta = gather_mean_sta_axis(a1(nn.Dense(h)(x)), sta_nbr)
        agg_src = gather_mean_src_axis(a2(nn.Dense(h)(x)), src_nbr)
        return a3(nn.Dense(h)(jnp.concatenate((x, agg_sta, agg_src), -1)))


class GNNLocation(nn.Module):
    """Relocation GNN: product conv ×5 → per-source Δx (scaled), Δt, and
    per-station P/S corrections (ref :438-538)."""

    n_hidden: int = 30
    pos_scale: float = 5e3
    n_rounds: int = 5

    @nn.compact
    def __call__(self, feat, src_nbr, sta_nbr, prod_mask):
        # feat: (S, n_sta, 15); prod_mask: (S, n_sta, 1)
        act_in, act_src, act_sta = PReLU(), PReLU(), PReLU()
        x = act_in(nn.Dense(self.n_hidden)(feat))
        for _ in range(self.n_rounds):
            x = _DualConv(self.n_hidden)(x, sta_nbr, src_nbr)
        x = x * prod_mask
        src_emb = act_src(nn.Dense(self.n_hidden)(x.sum(axis=1)))   # (S, h)
        sta_emb = act_sta(nn.Dense(self.n_hidden)(x.sum(axis=0)))   # (n_sta, h)
        d_pos = self.pos_scale * jnp.tanh(nn.Dense(3, name="proj")(src_emb))
        d_t = nn.Dense(1, name="proj_t")(src_emb)[:, 0]
        sta_corr = nn.Dense(2, name="proj_c")(sta_emb)
        return d_pos, d_t, sta_corr


def make_feature_tensor(graph: RelocGraph, sta_cart, resid, partials,
                        scale_t: float = 5.0, scale_x: float = 50e3,
                        memory=None):
    """15-dim per-(source, station) inputs (ref :766-789); ``memory``
    optionally appends the EMA of previous predictions (Δx/Δt per source,
    the reference's buffer_weight=0.98 memory input, ref :793-820)."""
    off = (graph.src_pos[:, None, :] - sta_cart[None, :, :]) / scale_x
    off_n = jnp.linalg.norm(off, axis=-1, keepdims=True)
    pick_cnt = graph.obs_mask.sum(axis=(1, 2))
    log_cnt = jnp.log1p(pick_cnt)[:, None, None] * jnp.ones_like(off_n)
    p_scaled = partials * (1.0 / 60.0) * jnp.asarray([1.0, 1.0, 100e3]).reshape(1, 1, 1, 3)
    parts = [
        resid[:, :, 0:1] / scale_t, resid[:, :, 1:2] / scale_t,
        p_scaled[:, :, 0, :], p_scaled[:, :, 1, :],
        off, off_n, log_cnt,
        graph.obs_mask[:, :, 0:1], graph.obs_mask[:, :, 1:2],
    ]
    if memory is not None:
        n_sta = sta_cart.shape[0]
        parts.append(jnp.broadcast_to(memory[:, None, :],
                                      (memory.shape[0], n_sta, memory.shape[1])))
    feat = jnp.concatenate(parts, axis=-1)
    prod_mask = (graph.obs_mask.max(axis=-1, keepdims=True) > 0).astype(jnp.float32)
    return feat * prod_mask, prod_mask


def make_dd_loss(model: GNNLocation, trv_from_cart, sta_cart,
                 w_dd: float = 0.8, w_abs: float = 0.1, w_sta: float = 0.1,
                 use_memory: bool = False):
    """Differentiable relocation loss through the travel-time surrogate."""

    def loss_fn(params, graph: RelocGraph, memory=None):
        resid, partials = build_catalog_data(
            trv_from_cart, sta_cart, graph.src_pos, graph.src_time,
            graph.obs_time, graph.obs_mask)
        feat, prod_mask = make_feature_tensor(graph, sta_cart, resid, partials,
                                              memory=memory)
        d_pos, d_t, sta_corr = model.apply(params, feat, graph.src_nbr,
                                           graph.sta_nbr, prod_mask)
        new_pos = graph.src_pos + d_pos * graph.src_mask[:, None]
        new_t = graph.src_time + d_t * graph.src_mask
        pred = (trv_from_cart(sta_cart, new_pos) + new_t[:, None, None]
                + sta_corr[None, :, :])
        r = (graph.obs_time - pred)
        m = graph.obs_mask

        # absolute residual (L1)
        l_abs = (jnp.abs(r) * m).sum() / jnp.maximum(m.sum(), 1)
        # station-mean residual
        sta_mean = (r * m).sum(axis=0) / jnp.maximum(m.sum(axis=0), 1)
        l_sta = jnp.abs(sta_mean).mean()
        # double difference over loss pairs: for shared stations/phases,
        # the *difference* of residuals should vanish
        ra, rb = r[graph.pair_a], r[graph.pair_b]
        ma = m[graph.pair_a] * m[graph.pair_b]
        dd = (ra - rb) * ma
        l_dd = (jnp.abs(dd).sum(axis=(1, 2)) / jnp.maximum(ma.sum(axis=(1, 2)), 1)
                * graph.pair_mask).sum() / jnp.maximum(graph.pair_mask.sum(), 1)

        total = w_dd * l_dd + w_abs * l_abs + w_sta * l_sta
        return total, ({"dd": l_dd, "abs": l_abs, "sta": l_sta},
                       jax.lax.stop_gradient(d_pos), jax.lax.stop_gradient(d_t))

    return loss_fn


def train_graphdd(key, model: GNNLocation, trv_from_cart, sta_cart, graphs,
                  n_steps: int = 500, lr: float = 1e-3,
                  use_memory: bool = False, buffer_weight: float = 0.98):
    """Adam over the relocation graphs (ref: 50k steps; caller scales).
    ``use_memory`` feeds the EMA of previous (Δx, Δt) predictions back as an
    input (ref :793-820); buffers are per graph."""
    g0 = graphs[0]
    resid, partials = build_catalog_data(trv_from_cart, sta_cart, g0.src_pos,
                                         g0.src_time, g0.obs_time, g0.obs_mask)
    mem0 = jnp.zeros((g0.src_pos.shape[0], 4)) if use_memory else None
    feat, prod_mask = make_feature_tensor(g0, sta_cart, resid, partials, memory=mem0)
    params = model.init(key, feat, g0.src_nbr, g0.sta_nbr, prod_mask)
    loss_fn = make_dd_loss(model, trv_from_cart, sta_cart, use_memory=use_memory)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, graph, mem):
        (total, (parts, dpos, dt)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, graph, mem)
        u, s = opt.update(grads, s, p)
        return optax.apply_updates(p, u), s, total, dpos, dt

    S = graphs[0].src_pos.shape[0]
    mems = [jnp.zeros((S, 4)) for _ in graphs] if use_memory else [None] * len(graphs)
    for i in range(n_steps):
        gi = i % len(graphs)
        params, opt_state, total, dpos, dt = step(params, opt_state, graphs[gi], mems[gi])
        if use_memory:
            upd = jnp.concatenate((dpos / model.pos_scale, dt[:, None]), axis=1)
            mems[gi] = buffer_weight * mems[gi] + (1 - buffer_weight) * upd
    return params, float(total)


def relocate(model: GNNLocation, params, trv_from_cart, sta_cart, graph: RelocGraph):
    """Apply the trained model: returns (new_pos, new_t, sta_corr)."""
    resid, partials = build_catalog_data(
        trv_from_cart, sta_cart, graph.src_pos, graph.src_time,
        graph.obs_time, graph.obs_mask)
    feat, prod_mask = make_feature_tensor(graph, sta_cart, resid, partials)
    d_pos, d_t, sta_corr = model.apply(params, feat, graph.src_nbr,
                                       graph.sta_nbr, prod_mask)
    return (graph.src_pos + d_pos * graph.src_mask[:, None],
            graph.src_time + d_t * graph.src_mask, sta_corr)
