"""On-device k-nearest-neighbour search with static shapes.

TPU-native replacement for ``torch_cluster.knn`` (used throughout the
reference for station/source graph construction, SpatialAttention's
per-forward knn at ``module.py:282``, magnitude bias lookup, and the
calibration interpolators; see SURVEY §2.10).

Design: brute-force masked distance matrix + ``jax.lax.top_k``. All shapes
static; invalid (padded) context points get +inf distance and are never
selected while any valid point remains. For context sets ≫ 100k points use
:func:`knn_tiled`, which streams context tiles through a running top-k so the
full distance matrix never materializes in HBM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_INF = jnp.inf


def pairwise_sq_dist(x_query, x_context):
    """Squared euclidean distances, (n_q, n_c). Uses the |a|²+|b|²-2ab form so
    the cross term is one MXU matmul."""
    q2 = jnp.sum(x_query**2, axis=-1, keepdims=True)
    c2 = jnp.sum(x_context**2, axis=-1, keepdims=True).T
    cross = x_query @ x_context.T
    return jnp.maximum(q2 + c2 - 2.0 * cross, 0.0)


@partial(jax.jit, static_argnames=("k",))
def knn(x_context, x_query, k: int, context_mask=None):
    """Indices of the ``k`` nearest context points for each query.

    Returns ``(idx, valid)``: ``idx`` is ``(n_q, k)`` int32 into
    ``x_context``; ``valid`` is ``(n_q, k)`` bool marking selections that are
    real (un-masked) context points. With fewer than ``k`` valid context
    points the remaining slots repeat the nearest valid index but are marked
    invalid.
    """
    d = pairwise_sq_dist(x_query, x_context)
    if context_mask is not None:
        d = jnp.where(context_mask[None, :], d, _INF)
    neg, idx = jax.lax.top_k(-d, k)
    valid = jnp.isfinite(neg)
    # replace invalid picks with the nearest valid one so gathers stay in-range
    idx = jnp.where(valid, idx, idx[:, :1])
    return idx.astype(jnp.int32), valid


@partial(jax.jit, static_argnames=("k",))
def knn_graph(x, k: int, mask=None):
    """k-NN graph over one point set, self excluded (the reference's
    ``remove_self_loops(knn(x, x, k+1))`` pattern, train_GENIE_model.py:1140).

    Returns ``(nbr, valid)`` of shape ``(n, k)``: for each node, its k nearest
    other nodes. Masked (padded) nodes neither send nor receive.
    """
    n = x.shape[0]
    d = pairwise_sq_dist(x, x)
    d = jnp.fill_diagonal(d, _INF, inplace=False)
    if mask is not None:
        d = jnp.where(mask[None, :], d, _INF)
    neg, idx = jax.lax.top_k(-d, k)
    valid = jnp.isfinite(neg)
    if mask is not None:
        valid = valid & mask[:, None]
    idx = jnp.where(valid, idx, jnp.arange(n, dtype=idx.dtype)[:, None])
    return idx.astype(jnp.int32), valid


@partial(jax.jit, static_argnames=("k", "tile"))
def knn_tiled(x_context, x_query, k: int, context_mask=None, tile: int = 8192):
    """Streaming variant for large context sets: scans context tiles and
    maintains a running top-k, so peak memory is O(n_q · (tile + 2k))."""
    n_c = x_context.shape[0]
    n_tiles = -(-n_c // tile)
    pad = n_tiles * tile - n_c
    xc = jnp.pad(x_context, ((0, pad), (0, 0)))
    cmask = jnp.arange(n_tiles * tile) < n_c
    if context_mask is not None:
        cmask = cmask & jnp.pad(context_mask, (0, pad))
    xc = xc.reshape(n_tiles, tile, -1)
    cmask = cmask.reshape(n_tiles, tile)

    n_q = x_query.shape[0]
    init_scores = jnp.full((n_q, k), -_INF)
    init_idx = jnp.zeros((n_q, k), dtype=jnp.int32)

    def body(carry, inp):
        best_s, best_i = carry
        xc_t, m_t, t = inp
        d = pairwise_sq_dist(x_query, xc_t)
        d = jnp.where(m_t[None, :], d, _INF)
        s, i = jax.lax.top_k(-d, min(k, tile))
        i = i + t * tile
        cat_s = jnp.concatenate((best_s, s), axis=1)
        cat_i = jnp.concatenate((best_i, i.astype(jnp.int32)), axis=1)
        new_s, sel = jax.lax.top_k(cat_s, k)
        new_i = jnp.take_along_axis(cat_i, sel, axis=1)
        return (new_s, new_i), None

    (scores, idx), _ = jax.lax.scan(
        body,
        (init_scores, init_idx),
        (xc, cmask, jnp.arange(n_tiles)),
    )
    valid = jnp.isfinite(scores)
    idx = jnp.where(valid, idx, idx[:, :1])
    return idx, valid
