"""Segment (scatter/gather) operations — the generic graph-kernel substrate.

TPU-native replacement for ``torch_scatter.scatter`` and
``torch_geometric.utils.softmax`` (every ``propagate`` call in the reference's
``module.py`` reduces to these; SURVEY §2.10). Two families:

* **Edge-list ops** (`spmm`, `segment_*`): arbitrary COO edge lists, used for
  irregular structures (pick graphs, subgraph mode) and as the
  benchmark surface vs. CPU PyG (BASELINE north-star: edges/s/chip fwd+bwd).
  Sums use sorted-segment form so XLA lowers to efficient on-chip scans.

* **Fixed-k gather ops** (`gather_mean`, `gather_sum`, axis variants): the
  hot path. GENIE's graphs all have fixed fan-in (station kNN k=8, source kNN
  k=15, time-pointer k=10), so aggregation = gather + masked mean along a
  k axis — no scatter at all, fully dense, MXU/VPU friendly, and trivially
  shardable over a device mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Edge-list (COO) ops
# ---------------------------------------------------------------------------

def segment_sum(data, segment_ids, num_segments: int):
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_mean(data, segment_ids, num_segments: int):
    s = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    cnt = jax.ops.segment_sum(
        jnp.ones(data.shape[:1], data.dtype), segment_ids, num_segments=num_segments
    )
    return s / jnp.maximum(cnt, 1.0)[(...,) + (None,) * (data.ndim - 1)]


def segment_max(data, segment_ids, num_segments: int):
    return jax.ops.segment_max(data, segment_ids, num_segments=num_segments)


def segment_softmax(scores, segment_ids, num_segments: int):
    """Numerically-stable softmax within segments (PyG ``softmax`` twin).

    ``scores``: (E, ...) with segment axis first. Empty segments yield zeros.
    """
    m = jax.ops.segment_max(scores, segment_ids, num_segments=num_segments)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.exp(scores - m[segment_ids])
    z = jax.ops.segment_sum(e, segment_ids, num_segments=num_segments)
    return e / jnp.maximum(z, 1e-20)[segment_ids]


@partial(jax.jit, static_argnames=("num_dst", "aggr"))
def spmm(edge_src, edge_dst, x, num_dst: int, edge_weight=None, aggr: str = "sum"):
    """Sparse matrix × dense matrix via an edge list: for every edge (s → d),
    accumulate ``x[s]`` (optionally weighted) into row ``d``.

    This is the benchmarked op (BASELINE: aggregated edges/s/chip fwd+bwd);
    differentiable (gather + segment_sum are both linear)."""
    msg = x[edge_src]
    if edge_weight is not None:
        msg = msg * edge_weight[:, None]
    if aggr == "sum":
        return jax.ops.segment_sum(msg, edge_dst, num_segments=num_dst)
    if aggr == "mean":
        return segment_mean(msg, edge_dst, num_dst)
    if aggr == "max":
        return jax.ops.segment_max(msg, edge_dst, num_segments=num_dst)
    raise ValueError(f"unknown aggr {aggr!r}")


# ---------------------------------------------------------------------------
# Fixed-k gather ops (dense hot path)
# ---------------------------------------------------------------------------

def gather_sum(x, nbr_idx, nbr_valid=None):
    """``out[i] = Σ_k x[nbr_idx[i, k]]`` with optional validity mask.

    x: (N, C); nbr_idx: (M, k) int; nbr_valid: (M, k) bool → (M, C).
    """
    g = x[nbr_idx]  # (M, k, C)
    if nbr_valid is not None:
        g = g * nbr_valid[..., None]
    return g.sum(axis=1)


def gather_mean(x, nbr_idx, nbr_valid=None):
    g = x[nbr_idx]
    if nbr_valid is None:
        return g.mean(axis=1)
    g = g * nbr_valid[..., None]
    cnt = jnp.maximum(nbr_valid.sum(axis=1, keepdims=True), 1)
    return g.sum(axis=1) / cnt


def gather_mean_sta_axis(feat, sta_nbr, sta_valid=None):
    """Aggregate product-graph features along the *station* axis.

    The reference's ``A_prod_sta_sta`` convolution ("same source node,
    neighbouring stations", train_GENIE_model.py:1145) on the dense layout:
    feat (n_src, n_sta, C), sta_nbr (n_sta, k) → (n_src, n_sta, C) where
    out[s, i] = mean_k feat[s, sta_nbr[i, k]].
    """
    g = feat[:, sta_nbr, :]  # (n_src, n_sta, k, C)
    if sta_valid is None:
        return g.mean(axis=2)
    g = g * sta_valid[None, :, :, None]
    cnt = jnp.maximum(sta_valid.sum(axis=1), 1)[None, :, None]
    return g.sum(axis=2) / cnt


def gather_mean_src_axis(feat, src_nbr, src_valid=None):
    """Aggregate product-graph features along the *source* axis
    (``A_prod_src_src``: "same station, neighbouring source nodes")."""
    g = feat[src_nbr, :, :]  # (n_src, k, n_sta, C)
    if src_valid is None:
        return g.mean(axis=1)
    g = g * src_valid[:, :, None, None]
    cnt = jnp.maximum(src_valid.sum(axis=1), 1)[:, None, None]
    return g.sum(axis=1) / cnt


# ---------------------------------------------------------------------------
# Dense-matmul aggregation (MXU path)
# ---------------------------------------------------------------------------
#
# With fixed-k kNN graphs the mean-aggregation operator is a row-stochastic
# matrix A (k/n dense). For n up to a few thousand, A is small enough that a
# *dense* matmul on the MXU moves far fewer bytes than the (n, k, C) gather
# (it reads x once instead of k times) and runs at matrix-unit throughput.
# This is the TPU-native answer to torch_scatter: SpMM → dense MXU matmul
# whenever density k/n ≳ 1e-3, gather otherwise (and the sharded halo path
# at pod scale, see genie_tpu.parallel.product_shard).

def aggregation_matrix(nbr_idx, n: int, nbr_valid=None, dtype=jnp.float32):
    """Row-normalized averaging matrix A (m, n): A[i, j] = 1/deg(i) iff j is
    a (valid) neighbour of i."""
    m, k = nbr_idx.shape
    w = jnp.ones((m, k), dtype) if nbr_valid is None else nbr_valid.astype(dtype)
    deg = jnp.maximum(w.sum(axis=1, keepdims=True), 1.0)
    a = jnp.zeros((m, n), dtype)
    a = a.at[jnp.arange(m)[:, None], nbr_idx].add(w / deg)
    return a


def matmul_mean_sta_axis(feat, a_sta):
    """out[s, i, c] = Σ_j A[i, j]·feat[s, j, c] via one MXU contraction.
    a_sta: (n_sta, n_sta) from :func:`aggregation_matrix`."""
    return jnp.einsum("sjc,ij->sic", feat, a_sta,
                      preferred_element_type=feat.dtype)


def matmul_mean_src_axis(feat, a_src):
    """out[i, s, c] = Σ_j A[i, j]·feat[j, s, c]; a_src: (n_src, n_src)."""
    n_src, n_sta, c = feat.shape
    out = a_src @ feat.reshape(n_src, n_sta * c)
    return out.reshape(n_src, n_sta, c)


def mean_sta_axis(feat, sta_nbr, sta_valid=None, via_matmul: bool = False):
    """Station-axis mean aggregation; ``via_matmul`` selects the MXU path
    (builds the row-stochastic matrix inline — XLA CSEs repeats)."""
    if via_matmul:
        a = aggregation_matrix(sta_nbr, feat.shape[1], sta_valid, feat.dtype)
        return matmul_mean_sta_axis(feat, a)
    return gather_mean_sta_axis(feat, sta_nbr, sta_valid)


def mean_src_axis(feat, src_nbr, src_valid=None, via_matmul: bool = False):
    if via_matmul:
        a = aggregation_matrix(src_nbr, feat.shape[0], src_valid, feat.dtype)
        return matmul_mean_src_axis(feat, a)
    return gather_mean_src_axis(feat, src_nbr, src_valid)
