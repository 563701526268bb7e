"""The full detection + association GNN (flagship model).

TPU-native equivalent of ``GCN_Detection_Network_extended``
(ref module.py:880-1186): DataAggregation → BipartiteReadIn →
SpatialAggregation×3 → {SpatialDirect→TemporalAttention (grid detection),
SpatialAttention→TemporalAttention (query detection)} → masked
BipartiteReadOut → DataAggregationAssociationPhase → LocalSliceCollapse (P,S)
→ StationSourceAttention → per-pick P/S association scores.

All inputs are static-shaped; the graph structure is carried by a
:class:`GraphBundle` of gather tables built in ``genie_tpu.graphs`` (the
reference's ``set_adjacencies`` contract). The same ``__call__`` serves
training and inference; ``forward_detection_only`` mirrors
``forward_fixed_source`` (detection sweep without the association head).
"""

from __future__ import annotations

import typing as _t
from typing import NamedTuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from genie_tpu.models.layers import (
    BipartiteReadIn,
    BipartiteReadOut,
    DataAggregation,
    DataAggregationAssociationPhase,
    LocalSliceCollapse,
    SpatialAggregation,
    SpatialAttention,
    SpatialDirect,
    StationSourceAttention,
    TemporalAttention,
)


class GraphBundle(NamedTuple):
    """Static gather-table description of one sample's graphs.

    Replaces the 8 adjacency structures of the reference
    (train_GENIE_model.py:1140-1175) with fixed-k tables on the dense
    product layout.
    """

    sta_nbr: jnp.ndarray        # (n_sta, k_sta) station kNN (A_sta_sta)
    sta_nbr_valid: jnp.ndarray  # (n_sta, k_sta) bool
    src_nbr: jnp.ndarray        # (n_src, k_spc) source-grid kNN (A_src_src)
    sta_mask: jnp.ndarray       # (n_sta,) bool — real vs padded stations
    edge_feat: jnp.ndarray      # (n_src, n_sta, 3) (src−sta)/scale, lat/lon/depth units
    src_pos: jnp.ndarray        # (n_src, 3) grid Cartesian (m)
    time_ptr_p: jnp.ndarray     # (n_sta, n_dt, k_time) int32 source indices
    time_ptr_s: jnp.ndarray
    dt0: jnp.ndarray            # scalar — time partition start
    dt: jnp.ndarray             # scalar — partition step
    trv: jnp.ndarray            # (n_src, n_sta, 2) travel times to grid


class PickSet(NamedTuple):
    """Padded pick window."""

    tpick: jnp.ndarray       # (n_pick,) times relative to window t0
    ipick: jnp.ndarray       # (n_pick,) int32 station index
    phase: jnp.ndarray       # (n_pick, 1) float phase label (0=P, 1=S)
    mask: jnp.ndarray        # (n_pick,) bool
    pair_idx: jnp.ndarray    # (n_pick, k_pair) co-station picks; == n_pick → null
    pair_valid: jnp.ndarray  # (n_pick, k_pair) bool


class QuerySet(NamedTuple):
    x_query: jnp.ndarray       # (n_q, 3) detection query positions (cart)
    x_query_idx: jnp.ndarray   # (n_q, k_attn) grid kNN of each query
    t_query: jnp.ndarray       # (n_t, 1) time offsets
    x_qsrc: jnp.ndarray        # (n_qsrc, 3) association query positions (cart)
    x_qsrc_idx: jnp.ndarray    # (n_qsrc, k_attn)
    tq_sample: jnp.ndarray     # (n_qsrc,) association query origin times
    trv_qsrc: jnp.ndarray      # (n_qsrc, n_sta, 2) travel times at assoc queries


class Detector(nn.Module):
    """Flagship model. Channel widths follow the reference exactly
    (4→15/30 hidden, 30 latent; module.py:882-900)."""

    scale_rel: float = 30e3
    kernel_sig_t: float = 3.0
    use_phase_types: bool = True
    use_absolute_pos: bool = False
    src_chunk: int = 16
    mask_p_thresh: float = 0.01
    # MXU matmul aggregation (vs fixed-k gather): exact, much faster for
    # n_src/n_sta up to a few thousand — see ops/segment.py
    via_matmul: bool = False
    # count-normalized bipartite read-in (conditioning aid for large
    # networks; see layers.BipartiteReadIn.normalize)
    normalize_readin: bool = False
    # updated model definition: Gaussian-embedded relative-position edge
    # features in both dual-relation convs (ref module.py:102-210,
    # :1059-1072 — DataAggregationEdges variant)
    use_updated_model_definition: bool = False
    # pod-scale override for the source-axis product aggregation (see
    # parallel/sharded_detector.py); parameter structure is unchanged, so
    # dense-trained weights run sharded and vice versa
    src_agg: _t.Callable | None = None

    @property
    def scale_t(self) -> float:
        return 3.0 * self.kernel_sig_t

    @property
    def eps(self) -> float:
        return 5.0 * self.kernel_sig_t

    def setup(self):
        in_ch = 4 + (6 if self.use_absolute_pos else 0)
        self.data_agg = DataAggregation(
            in_channels=in_ch, out_channels=15, via_matmul=self.via_matmul,
            use_edges=self.use_updated_model_definition,
            src_agg=self.src_agg)
        self.read_in = BipartiteReadIn(30, 15, normalize=self.normalize_readin)
        self.spatial1 = SpatialAggregation(15, 30, scale_rel=self.scale_rel)
        self.spatial2 = SpatialAggregation(30, 30, scale_rel=self.scale_rel)
        self.spatial3 = SpatialAggregation(30, 30, scale_rel=self.scale_rel)
        self.spatial_direct = SpatialDirect(30)
        self.spatial_attn = SpatialAttention(30, 30, n_latent=15, n_heads=5, scale_rel=self.scale_rel)
        self.temporal_attn = TemporalAttention(30, 1, n_latent=15, n_heads=5, scale_t=self.scale_t)
        self.read_out = BipartiteReadOut(30, 15)
        self.assoc_agg = DataAggregationAssociationPhase(
            15, 15, via_matmul=self.via_matmul,
            use_edges=self.use_updated_model_definition,
            src_agg=self.src_agg)
        self.slice_p = LocalSliceCollapse(30, 15, eps=self.eps, use_phase_types=self.use_phase_types)
        self.slice_s = LocalSliceCollapse(30, 15, eps=self.eps, use_phase_types=self.use_phase_types)
        self.arrivals = StationSourceAttention(
            30, 15, 2, n_latent=15, n_heads=3, eps=self.eps,
            use_phase_types=self.use_phase_types, src_chunk=self.src_chunk,
        )

    def _rel_tables(self, graph: GraphBundle, sta_pos):
        """Edge-feature tables for the updated model definition (the
        reference precomputes pos_rel_sta/pos_rel_src per forward,
        module.py:1059-1072)."""
        if not self.use_updated_model_definition:
            return None, None
        from genie_tpu.models.layers import mean_rel_pos_embed
        rel_sta = mean_rel_pos_embed(sta_pos, graph.sta_nbr, self.scale_rel,
                                     graph.sta_nbr_valid)
        rel_src = mean_rel_pos_embed(graph.src_pos, graph.src_nbr, self.scale_rel)
        return rel_sta, rel_src

    def _trunk_product(self, feat, mask, graph: GraphBundle, sta_pos,
                       rel_sta=None, rel_src=None):
        """Product-tensor stage: dual-relation conv + station read-in.
        This is the memory/FLOP-dominant part; the sharded trunk runs it
        under shard_map with source-partitioned rows."""
        if self.use_absolute_pos:
            n_src, n_sta = feat.shape[:2]
            sta_b = jnp.broadcast_to(sta_pos[None], (n_src, n_sta, 3)) / (3.0 * self.scale_rel)
            src_b = jnp.broadcast_to(graph.src_pos[:, None], (n_src, n_sta, 3)) / (3.0 * self.scale_rel)
            feat = jnp.concatenate((feat, sta_b, src_b), axis=-1)
        if rel_sta is None:
            rel_sta, rel_src = self._rel_tables(graph, sta_pos)
        x_latent = self.data_agg(feat, mask, graph.sta_nbr, graph.sta_nbr_valid,
                                 graph.src_nbr, rel_sta, rel_src)
        x = self.read_in(x_latent, graph.edge_feat, mask, graph.sta_mask)
        return x_latent, x

    def _trunk_nodes(self, x, graph: GraphBundle):
        """Node-tensor stage: source-graph convs + direct head (cheap:
        (n_src, C) only)."""
        x = self.spatial1(x, graph.src_nbr, graph.src_pos)
        x = self.spatial2(x, graph.src_nbr, graph.src_pos)
        x_spatial = self.spatial3(x, graph.src_nbr, graph.src_pos)
        y_latent = self.spatial_direct(x_spatial)
        return x_spatial, y_latent

    def _detection_trunk(self, feat, mask, graph: GraphBundle, sta_pos):
        x_latent, x = self._trunk_product(feat, mask, graph, sta_pos)
        x_spatial, y_latent = self._trunk_nodes(x, graph)
        return x_latent, x_spatial, y_latent

    def __call__(self, feat, mask, graph: GraphBundle, sta_pos, picks: PickSet, queries: QuerySet):
        """Full forward. Returns (y, x, arv_p, arv_s):
        y (n_src, n_t, 1) grid detection; x (n_q, n_t, 1) query detection;
        arv_p/arv_s (n_qsrc, n_pick, 1) association scores."""
        x_latent, x_spatial, y_latent = self._detection_trunk(feat, mask, graph, sta_pos)
        y = self.temporal_attn(y_latent, queries.t_query)
        x_q = self.spatial_attn(x_spatial, queries.x_query_idx, graph.src_pos, queries.x_query)
        x_src = self.spatial_attn(x_spatial, queries.x_qsrc_idx, graph.src_pos, queries.x_qsrc)
        x_q = self.temporal_attn(x_q, queries.t_query)

        mask_out = (jax.lax.stop_gradient(y[:, :, 0]).max(axis=1, keepdims=True)
                    > self.mask_p_thresh).astype(jnp.float32)
        s, mask_out_prod = self.read_out(y_latent, graph.edge_feat, mask_out)
        if self.use_absolute_pos:
            n_src, n_sta = s.shape[:2]
            sta_b = jnp.broadcast_to(sta_pos[None], (n_src, n_sta, 3)) / (3.0 * self.scale_rel)
            src_b = jnp.broadcast_to(graph.src_pos[:, None], (n_src, n_sta, 3)) / (3.0 * self.scale_rel)
            s = jnp.concatenate((s, sta_b, src_b), axis=-1)
        rel_sta, rel_src = self._rel_tables(graph, sta_pos)
        s = self.assoc_agg(s, jax.lax.stop_gradient(x_latent), mask_out_prod, mask,
                           graph.sta_nbr, graph.sta_nbr_valid, graph.src_nbr,
                           rel_sta, rel_src)
        arv_p = self.slice_p(graph.time_ptr_p, graph.dt0, graph.dt, picks.tpick, picks.ipick,
                             picks.phase, s, graph.trv[:, :, 0], picks.mask)
        arv_s = self.slice_s(graph.time_ptr_s, graph.dt0, graph.dt, picks.tpick, picks.ipick,
                             picks.phase, s, graph.trv[:, :, 1], picks.mask)
        arv = self.arrivals(queries.tq_sample, x_src, queries.trv_qsrc, arv_p, arv_s,
                            picks.tpick, picks.ipick, picks.phase,
                            picks.pair_idx, picks.pair_valid, picks.mask)
        return y, x_q, arv[:, :, 0:1], arv[:, :, 1:2]

    def _detection_heads(self, x_spatial, y_latent, graph: GraphBundle,
                         x_query, x_query_idx, t_query):
        y = self.temporal_attn(y_latent, t_query)
        x_q = self.spatial_attn(x_spatial, x_query_idx, graph.src_pos, x_query)
        x_q = self.temporal_attn(x_q, t_query)
        return y, x_q

    def forward_detection_only(self, feat, mask, graph: GraphBundle, sta_pos,
                               x_query, x_query_idx, t_query):
        """Detection sweep without the association head (the reference's
        ``forward_fixed_source``, module.py:999-1020)."""
        _, x_spatial, y_latent = self._detection_trunk(feat, mask, graph, sta_pos)
        return self._detection_heads(x_spatial, y_latent, graph,
                                     x_query, x_query_idx, t_query)

    def forward_trunk(self, feat, mask, graph: GraphBundle, sta_pos):
        """Product trunk only — reusable across many query sets (the
        refinement stage re-queries one window at ~100k offsets; the trunk
        must not be recomputed per offset chunk)."""
        _, x_spatial, y_latent = self._detection_trunk(feat, mask, graph, sta_pos)
        return x_spatial, y_latent

    def forward_query_head(self, x_spatial, graph: GraphBundle, x_query,
                           x_query_idx, t_query):
        """Query detection head on a precomputed trunk (pairs with
        :meth:`forward_trunk`)."""
        x_q = self.spatial_attn(x_spatial, x_query_idx, graph.src_pos, x_query)
        return self.temporal_attn(x_q, t_query)
