"""Subgraph (sparse product) mode: ε+kNN source-station pair selection.

The reference's answer to product graphs larger than ~50-100k nodes
(``use_subgraph``, process_utils.py:744-849; Code/README.md:15): keep only
(source, station) pairs within ``max_deg_offset`` degrees plus each source's
``k_nearest_pairs`` stations.

In this framework the dense product layout makes the *mask* the subgraph:
:func:`pair_mask` produces the (n_src, n_sta) boolean A_src_in_sta
selection. For single-chip runs it zeroes features (saving nothing but
numerically identical); at pod scale it drives the source-partitioned
sharding in ``genie_tpu.parallel.product_shard``, where each shard only
materializes its local sources and the mask bounds the stations it needs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pair_mask(src_lla, sta_lla, max_deg_offset: float = 1.5,
              k_nearest_pairs: int = 30):
    """(n_src, n_sta) bool: pairs within the ε-ball OR among each source's
    k nearest stations (mirrors the union of :770-782)."""
    d_deg = jnp.sqrt(((src_lla[:, None, :2] - sta_lla[None, :, :2]) ** 2).sum(-1))
    eps_ball = d_deg < max_deg_offset
    k = min(k_nearest_pairs, sta_lla.shape[0])
    _, idx = jax.lax.top_k(-d_deg, k)
    knn_mask = jnp.zeros_like(eps_ball).at[
        jnp.arange(src_lla.shape[0])[:, None], idx].set(True)
    return eps_ball | knn_mask


def apply_pair_mask(feat, mask, a_src_in_sta):
    """Zero product features outside the subgraph (numerically equivalent to
    the reference's sparse gather on the kept pairs)."""
    m = a_src_in_sta[:, :, None].astype(feat.dtype)
    return feat * m, mask * m
