"""Pod-scale Detector forward with a source-partitioned product tensor.

BASELINE config 5 (~1000 stations × ~100k-1M source nodes): the
(n_src, n_sta, C) product tensor no longer fits one chip. This module runs
the Detector's product stage (``_trunk_product`` — the dual-relation convs
and station read-in, which dominate memory and FLOPs) under ``shard_map``
with the source axis partitioned over the mesh:

  * station-axis aggregation is local (each shard holds complete station
    rows for its sources);
  * source-axis aggregation rides the precomputed halo exchange of
    :mod:`genie_tpu.parallel.product_shard` (one ``all_to_all`` over ICI
    per aggregation);
  * the node stage (``_trunk_nodes``: (n_src, C) source-graph convs) and
    detection heads are negligible and run replicated.

All product-scale operands (feat, mask, edge features, source positions)
enter ``shard_map`` as sharded arguments — nothing product-sized is closed
over, so per-device memory is n_src/n_shards rows plus the thin halo.

Parameter structure is identical to the dense Detector, so dense-trained
weights run sharded unchanged (tests assert exact equality on an 8-device
mesh). The reference has no counterpart — it caps n_sta×n_src at 50-100k
per GPU (Code/README.md:15); this is the TPU-native scale-out path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from genie_tpu.models.detector import Detector, GraphBundle
from genie_tpu.models.layers import mean_rel_pos_embed
from genie_tpu.parallel.product_shard import (
    build_partition,
    build_station_subselection,
    sharded_gather_mean_src_axis,
    sharded_gather_mean_src_axis_subsel,
)

try:  # jax >= 0.4.35
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def pad_to_shards(n_src: int, n_shards: int) -> int:
    """Source-grid padding so the partition divides evenly."""
    return int(-(-n_src // n_shards) * n_shards)


def make_sharded_detection_forward(model: Detector, graph: GraphBundle,
                                   sta_pos, mesh: Mesh,
                                   axis_name: str = "src"):
    """Build ``fn(params, feat, mask, x_query, x_query_idx, t_query) ->
    (y, x_q)`` — equal to ``Detector.forward_detection_only`` but with the
    product stage sharded over ``mesh``'s ``axis_name`` axis.

    The static halo plan is built once here (host side) from the source
    grid; n_src must be divisible by the mesh axis size (use
    :func:`pad_to_shards` when building the grid).
    """
    n_shards = mesh.shape[axis_name]
    part = build_partition(np.asarray(graph.src_pos),
                           np.asarray(graph.src_nbr), n_shards)
    perm, inv_perm = part.perm, part.inv_perm

    # edge-feature tables for the updated model definition are per-node and
    # cheap: compute densely in the original frame, permute rows below
    if model.use_updated_model_definition:
        rel_sta = mean_rel_pos_embed(sta_pos, graph.sta_nbr, model.scale_rel,
                                     graph.sta_nbr_valid)
        rel_src = mean_rel_pos_embed(graph.src_pos, graph.src_nbr,
                                     model.scale_rel)
    else:
        rel_sta = jnp.zeros((graph.sta_nbr.shape[0], 4))
        rel_src = jnp.zeros((graph.src_nbr.shape[0], 4))

    edge_feat_s = graph.edge_feat[perm]
    src_pos_s = graph.src_pos[perm]
    rel_src_s = rel_src[perm]

    # only node-scale / scalar fields may be closed over (shard_map
    # replicates captures); product-scale fields become dummies
    g_small = graph._replace(
        edge_feat=jnp.zeros((1, 1, 3)), trv=jnp.zeros((1, 1, 2)),
        time_ptr_p=jnp.zeros((1, 1, 1), jnp.int32),
        time_ptr_s=jnp.zeros((1, 1, 1), jnp.int32),
        src_pos=jnp.zeros((1, 3)),
    )

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(axis_name), P(axis_name), P(axis_name),
                       P(axis_name), P(axis_name)),
             out_specs=(P(axis_name), P(axis_name)))
    def product_stage(params, feat_l, mask_l, edge_l, srcpos_l, relsrc_l):
        sid = jax.lax.axis_index(axis_name)

        def src_agg(x):
            return sharded_gather_mean_src_axis(x, part, sid, axis_name)

        m = model.clone(src_agg=src_agg)
        g_l = g_small._replace(edge_feat=edge_l, src_pos=srcpos_l)
        x_latent_l, x_l = m.apply(params, feat_l, mask_l, g_l, sta_pos,
                                  rel_sta, relsrc_l,
                                  method=Detector._trunk_product)
        return x_latent_l, x_l

    def forward(params, feat, mask, x_query, x_query_idx, t_query):
        x_latent_s, x_s = product_stage(params, feat[perm], mask[perm],
                                        edge_feat_s, src_pos_s, rel_src_s)
        x = x_s[inv_perm]                       # node latents, original frame
        x_spatial, y_latent = model.apply(params, x, graph,
                                          method=Detector._trunk_nodes)
        y, x_q = model.apply(params, x_spatial, y_latent, graph,
                             x_query, x_query_idx, t_query,
                             method=Detector._detection_heads)
        return y, x_q

    return forward, part


def make_subgraph_sharded_detection_forward(model: Detector, graph: GraphBundle,
                                            sta_pos, mesh: Mesh, a_src_in_sta,
                                            axis_name: str = "src"):
    """Source-partitioned trunk with per-shard STATION sub-selection — the
    distributed subgraph (SURVEY §7.3; ref ``use_subgraph``,
    process_utils.py:744-849). Each shard materializes only the stations its
    local sources pair with under ``a_src_in_sta`` (the ε+kNN pair mask,
    ``genie_tpu.graphs.subgraph.pair_mask``), so per-device product memory is
    n_local × (n_sel+1) rows instead of n_local × n_sta — the actual memory
    saving the single-chip mask cannot provide. Halo source rows are remapped
    between shard station frames by the precomputed column maps.

    With an all-True mask this is exactly the dense forward (tested);
    with a real mask it implements the reference's true-subgraph semantics
    (absent pairs contribute nothing). Requires use_absolute_pos=False and
    the gather (non-matmul) aggregation path."""
    assert not model.use_absolute_pos, (
        "subgraph sharding needs use_absolute_pos=False (absolute-position "
        "channels would re-materialize absent pairs)")
    assert not model.via_matmul, "subgraph sharding uses the gather path"
    n_shards = mesh.shape[axis_name]
    part = build_partition(np.asarray(graph.src_pos),
                           np.asarray(graph.src_nbr), n_shards)
    sub = build_station_subselection(a_src_in_sta, part, graph.sta_nbr,
                                     graph.sta_nbr_valid)
    perm, inv_perm = part.perm, part.inv_perm
    n_sel = sub.n_sel

    if model.use_updated_model_definition:
        rel_sta_full = mean_rel_pos_embed(sta_pos, graph.sta_nbr,
                                          model.scale_rel, graph.sta_nbr_valid)
        rel_src = mean_rel_pos_embed(graph.src_pos, graph.src_nbr,
                                     model.scale_rel)
    else:
        rel_sta_full = jnp.zeros((graph.sta_nbr.shape[0], 4))
        rel_src = jnp.zeros((graph.src_nbr.shape[0], 4))

    def sel_sta_rows(x):
        """(n_sta, ...) → (n_shards, n_sel+1, ...): per-shard subset + zero
        sentinel row."""
        g = x[sub.sta_sel] * sub.sel_valid.reshape(sub.sel_valid.shape + (1,) * (x.ndim - 1))
        zero = jnp.zeros((g.shape[0], 1) + g.shape[2:], g.dtype)
        return jnp.concatenate((g, zero), axis=1)

    def sel_prod_cols(x_sorted):
        """(n_src, n_sta, C) sorted → (n_shards, n_local, n_sel+1, C)."""
        xb = x_sorted.reshape((n_shards, part.n_local) + x_sorted.shape[1:])
        g = jax.vmap(lambda b, s, v: b[:, s] * v[None, :, None])(
            xb, sub.sta_sel, sub.sel_valid.astype(x_sorted.dtype))
        zero = jnp.zeros(g.shape[:2] + (1, g.shape[-1]), g.dtype)
        return jnp.concatenate((g, zero), axis=2)

    sta_pos_sel = sel_sta_rows(sta_pos)                       # (n_sh, n_sel+1, 3)
    rel_sta_sel = sel_sta_rows(rel_sta_full)
    sta_mask_sel = jnp.concatenate(
        (graph.sta_mask[sub.sta_sel] & sub.sel_valid,
         jnp.zeros((n_shards, 1), bool)), axis=1)
    edge_sel = sel_prod_cols(graph.edge_feat[perm])
    src_pos_s = graph.src_pos[perm]
    rel_src_s = rel_src[perm]

    g_small = graph._replace(
        edge_feat=jnp.zeros((1, 1, 3)), trv=jnp.zeros((1, 1, 2)),
        time_ptr_p=jnp.zeros((1, 1, 1), jnp.int32),
        time_ptr_s=jnp.zeros((1, 1, 1), jnp.int32),
        src_pos=jnp.zeros((1, 3)), sta_nbr=jnp.zeros((1, 1), jnp.int32),
        sta_nbr_valid=jnp.zeros((1, 1), bool), sta_mask=jnp.zeros(1, bool),
    )

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(axis_name), P(axis_name), P(axis_name),
                       P(axis_name), P(axis_name), P(axis_name), P(axis_name),
                       P(axis_name), P(axis_name), P(axis_name), P(axis_name)),
             out_specs=P(axis_name))
    def product_stage(params, feat_l, mask_l, edge_l, srcpos_l, relsrc_l,
                      stanbr_l, stanbrv_l, stamask_l, stapos_l, relsta_l,
                      colmap_l):
        sid = jax.lax.axis_index(axis_name)
        feat_l, mask_l, edge_l = feat_l[0], mask_l[0], edge_l[0]
        stanbr_l, stanbrv_l = stanbr_l[0], stanbrv_l[0]
        stamask_l, stapos_l, relsta_l = stamask_l[0], stapos_l[0], relsta_l[0]
        colmap_l = colmap_l[0]

        def src_agg(x):
            # zero the sentinel column so absent stations contribute nothing
            x = x.at[:, -1].set(0.0)
            return sharded_gather_mean_src_axis_subsel(x, part, colmap_l,
                                                       sid, axis_name)

        m = model.clone(src_agg=src_agg)
        g_l = g_small._replace(edge_feat=edge_l, src_pos=srcpos_l,
                               sta_nbr=stanbr_l, sta_nbr_valid=stanbrv_l,
                               sta_mask=stamask_l)
        _, x_l = m.apply(params, feat_l, mask_l, g_l, stapos_l,
                         relsta_l, relsrc_l,
                         method=Detector._trunk_product)
        return x_l

    def forward(params, feat, mask, x_query, x_query_idx, t_query):
        feat_sel = sel_prod_cols(feat[perm])
        mask_sel = sel_prod_cols(mask[perm])
        x_s = product_stage(params, feat_sel, mask_sel, edge_sel,
                            src_pos_s, rel_src_s, sub.sta_nbr,
                            sub.sta_nbr_valid, sta_mask_sel, sta_pos_sel,
                            rel_sta_sel, sub.col_map)
        x = x_s.reshape(-1, x_s.shape[-1])[inv_perm]
        x_spatial, y_latent = model.apply(params, x, graph,
                                          method=Detector._trunk_nodes)
        y, x_q = model.apply(params, x_spatial, y_latent, graph,
                             x_query, x_query_idx, t_query,
                             method=Detector._detection_heads)
        return y, x_q

    return forward, part, sub
