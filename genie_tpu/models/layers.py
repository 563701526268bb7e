"""Flax layers of the detection/association GNN, on the dense product layout.

Each layer mirrors one MessagePassing module of the reference ``module.py``
(file:line cited per class) but is expressed TPU-natively: product-graph
features are dense ``(n_src, n_sta, C)`` tensors, neighbour structure is
fixed-k gather tables, attention is dense softmax over a k axis. No edge-list
scatter anywhere; every linear is a batched matmul.

Shape conventions:
  n_src — source-grid nodes (static, e.g. 500)
  n_sta — stations, padded to a static maximum; ``sta_mask`` marks real ones
  k_*   — static neighbour counts
"""

from __future__ import annotations



from typing import Callable

import jax
import jax.numpy as jnp
import flax.linen as nn

from genie_tpu.ops.segment import (
    mean_src_axis,
    mean_sta_axis,
)


class PReLU(nn.Module):
    """torch-style PReLU: single learnable slope, init 0.25."""

    init: float = 0.25

    @nn.compact
    def __call__(self, x):
        a = self.param("a", lambda k: jnp.asarray(self.init, jnp.float32))
        return jnp.maximum(x, 0.0) + a * jnp.minimum(x, 0.0)


def mean_rel_pos_embed(pos, nbr, scale_rel, valid=None):
    """Per-receiver mean of Gaussian-embedded relative sender positions —
    the edge features of the reference's updated model definition
    (``DataAggregationEdges``, module.py:102-210; embedding precomputed in
    the model forward, :1059-1072: ``sign(Δ)·exp(−Δ²/2σ²)`` of
    (Δxyz, ‖Δ‖) with σ = scale_rel, Δ in meters).

    TPU-native reduction: the reference concatenates the 4-dim edge feature
    to every message then MEAN-aggregates; since the post-aggregation
    transform is linear and the edge feature is sender-independent,
    ``mean(concat(x_j, e_ij)) == concat(mean(x_j), mean(e_ij))`` — so the
    per-edge features collapse exactly to this per-receiver (n, 4) table
    and the dense matmul layout is preserved.

    pos: (n, 3); nbr: (n, k) sender index per receiver; valid: (n, k) bool.
    Returns (n, 4).
    """
    rel = pos[nbr] - pos[:, None, :]                      # x_j − x_i, (n,k,3)
    nrm = jnp.sqrt((rel ** 2).sum(-1, keepdims=True) + 1e-12)
    rel = jnp.concatenate((rel, nrm), axis=-1)            # (n, k, 4)
    emb = jnp.sign(rel) * jnp.exp(-0.5 * rel ** 2 / scale_rel ** 2)
    if valid is not None:
        emb = ((emb * valid[..., None]).sum(1)
               / jnp.maximum(valid.sum(1, keepdims=True), 1))
    else:
        emb = emb.mean(axis=1)
    return emb


class DataAggregation(nn.Module):
    """Two rounds of dual-relation SAGE-style conv on the station×source
    product graph. Ref: module.py:52-98 (DataAggregation); with
    ``use_edges`` the updated-definition variant ``DataAggregationEdges``
    (module.py:102-210) whose messages carry Gaussian-embedded relative
    positions (see :func:`mean_rel_pos_embed` for the exact dense reduction).

    Input  (n_src, n_sta, in_ch) features + (n_src, n_sta, n_mask) mask.
    Output (n_src, n_sta, 2*out_ch) — concat of station-relation and
    source-relation halves.
    """

    in_channels: int = 4
    out_channels: int = 15
    n_hidden: int = 30
    n_mask: int = 4
    via_matmul: bool = False
    use_edges: bool = False
    # override for the source-axis product aggregation: callable (x) -> agg
    # with x (n_src_local, n_sta, C). Used by the pod-scale sharded trunk
    # (parallel/sharded_detector.py) to ride the halo exchange; None = dense
    # fixed-k gather/matmul over ``src_nbr``.
    src_agg: Callable | None = None

    @nn.compact
    def __call__(self, tr, mask, sta_nbr, sta_nbr_valid, src_nbr,
                 rel_sta=None, rel_src=None):
        h = self.n_hidden
        act = PReLU()
        act11, act12, act1 = PReLU(), PReLU(), PReLU()
        act21, act22, act2 = PReLU(), PReLU(), PReLU()
        agg_over_src = self.src_agg or (
            lambda x: mean_src_axis(x, src_nbr, via_matmul=self.via_matmul))

        if self.use_edges:
            n_src, n_sta = tr.shape[:2]
            e_sta = jnp.broadcast_to(rel_sta[None], (n_src, n_sta, 4))
            e_src = jnp.broadcast_to(rel_src[:, None], (n_src, n_sta, 4))

        def cat_sta(a):
            return jnp.concatenate((a, e_sta), -1) if self.use_edges else a

        def cat_src(a):
            return jnp.concatenate((a, e_src), -1) if self.use_edges else a

        tr = jnp.concatenate((tr, mask), axis=-1)
        tr = act(nn.Dense(h, name="init_trns")(tr))

        # Round 1 (the reference feeds act(tr) directly to propagate here;
        # its l1_*_1 linears exist but are unused — behaviour preserved)
        agg_sta = cat_sta(mean_sta_axis(act11(tr), sta_nbr, sta_nbr_valid, self.via_matmul))
        agg_src = cat_src(agg_over_src(act12(tr)))
        tr1 = nn.Dense(h, name="l1_t1_2")(jnp.concatenate((tr, agg_sta, mask), -1))
        tr2 = nn.Dense(h, name="l1_t2_2")(jnp.concatenate((tr, agg_src, mask), -1))
        tr = act1(jnp.concatenate((tr1, tr2), axis=-1))

        # Round 2
        agg_sta = cat_sta(mean_sta_axis(act21(nn.Dense(h, name="l2_t1_1")(tr)), sta_nbr, sta_nbr_valid, self.via_matmul))
        agg_src = cat_src(agg_over_src(act22(nn.Dense(h, name="l2_t2_1")(tr))))
        tr1 = nn.Dense(self.out_channels, name="l2_t1_2")(jnp.concatenate((tr, agg_sta, mask), -1))
        tr2 = nn.Dense(self.out_channels, name="l2_t2_2")(jnp.concatenate((tr, agg_src, mask), -1))
        return act2(jnp.concatenate((tr1, tr2), axis=-1))


class BipartiteReadIn(nn.Module):
    """Collapse product-graph features onto source nodes (sum over stations),
    gated by per-product-node pick presence. Ref: module.py:214-229
    (BipartiteGraphOperator); edge feature = (src_lla − sta_lla)/scale
    (train_GENIE_model.py:1697)."""

    ndim_in: int = 30
    ndim_out: int = 15
    # normalize the station sum by the active-station count (with a learnable
    # gain): conditioning aid for large networks (100s of stations) where the
    # reference's raw 'add' aggregation produces very large embeddings and
    # slows detection-head learning. Default False = reference behaviour.
    normalize: bool = False

    @nn.compact
    def __call__(self, x, edge_feat, mask, sta_mask):
        # x: (n_src, n_sta, ndim_in); edge_feat: (n_src, n_sta, 3)
        act1, act2 = PReLU(), PReLU()
        msg = act1(nn.Dense(self.ndim_in, name="fc1")(jnp.concatenate((x, edge_feat), -1)))
        gate = mask.max(axis=-1, keepdims=True)  # pick-presence per product node
        gate = gate * sta_mask[None, :, None]
        out = (msg * gate).sum(axis=1)  # sum over stations
        if self.normalize:
            gain = self.param("sum_gain", lambda k: jnp.asarray(8.0))
            out = out * gain / jnp.maximum(gate.sum(axis=1), 1.0)
        return act2(nn.Dense(self.ndim_out, name="fc2")(out))


class SpatialAggregation(nn.Module):
    """k-NN conv over the source spatial graph with a global context channel.
    Ref: module.py:231-249."""

    in_channels: int
    out_channels: int
    scale_rel: float = 30e3
    n_global: int = 5
    n_hidden: int = 30

    @nn.compact
    def __call__(self, x, src_nbr, pos):
        act1, act2, act3 = PReLU(), PReLU(), PReLU()
        p = pos / self.scale_rel
        x_j = x[src_nbr]                       # (n_src, k, C)
        rel = p[:, None, :] - p[src_nbr]       # pos_i - pos_j
        glob = act3(nn.Dense(self.n_global, name="fglobal")(x_j))
        glob = glob.mean(axis=(0, 1))          # mean over all edges (ref behaviour)
        glob = jnp.broadcast_to(glob, x_j.shape[:2] + (self.n_global,))
        msg = act1(nn.Dense(self.n_hidden, name="fc1")(jnp.concatenate((x_j, rel, glob), -1)))
        agg = msg.mean(axis=1)
        return act2(nn.Dense(self.out_channels, name="fc2")(jnp.concatenate((x, agg), -1)))


class SpatialDirect(nn.Module):
    """Per-node linear readout. Ref: module.py:251-260."""

    out_channels: int = 30

    @nn.compact
    def __call__(self, x):
        return PReLU()(nn.Dense(self.out_channels, name="f_direct")(x))


class SpatialAttention(nn.Module):
    """Multi-head k-NN cross-attention from the source grid to arbitrary
    query coordinates. Ref: module.py:262-297. The per-forward knn of the
    reference becomes a precomputed (n_q, k) gather table (same k=10)."""

    inpt_dim: int = 30
    out_channels: int = 30
    n_latent: int = 15
    n_heads: int = 5
    scale_rel: float = 30e3

    @nn.compact
    def __call__(self, x_context, ctx_idx, ctx_pos, query_pos):
        # ctx_idx: (n_q, k) indices into context (grid) nodes
        act1, act2 = PReLU(), PReLU()
        H, L = self.n_heads, self.n_latent
        n_q, k = ctx_idx.shape
        x_j = x_context[ctx_idx]                                   # (n_q, k, C)
        edge = (query_pos[:, None, :] - ctx_pos[ctx_idx]) / self.scale_rel
        q = nn.Dense(H * L, name="f_queries")(edge).reshape(n_q, k, H, L)
        c = nn.Dense(H * L, name="f_context")(jnp.concatenate((x_j, edge), -1)).reshape(n_q, k, H, L)
        v = nn.Dense(H * L, name="f_values")(jnp.concatenate((x_j, edge), -1)).reshape(n_q, k, H, L)
        alpha = act1((q * c).sum(-1) / jnp.sqrt(jnp.float32(L)))   # (n_q, k, H)
        alpha = jax.nn.softmax(alpha, axis=1)
        out = (alpha[..., None] * v).sum(axis=1)                   # (n_q, H, L)
        return act2(nn.Dense(self.out_channels, name="proj")(out.mean(axis=1)))


class TemporalAttention(nn.Module):
    """Dense multi-head attention of each node feature against query time
    offsets. Ref: module.py:299-331. Output (n_nodes, n_t, out)."""

    inpt_dim: int = 30
    out_channels: int = 1
    n_latent: int = 15
    n_heads: int = 5
    n_hidden: int = 30
    scale_t: float = 9.0

    @nn.compact
    def __call__(self, x, t_query):
        act1, act2, act3, act4, act5 = PReLU(), PReLU(), PReLU(), PReLU(), PReLU()
        H, L = self.n_heads, self.n_latent
        n, n_t = x.shape[0], t_query.shape[0]
        ctx = nn.Dense(H * L, name="f_context_2")(act1(nn.Dense(self.n_hidden, name="f_context_1")(x))).reshape(n, H, L)
        val = nn.Dense(H * L, name="f_values_2")(act2(nn.Dense(self.n_hidden, name="f_values_1")(x))).reshape(n, H, L)
        qry = nn.Dense(H * L, name="temporal_query_2")(
            act3(nn.Dense(self.n_hidden, name="temporal_query_1")(t_query / self.scale_t))
        ).reshape(n_t, H, L)
        scores = (ctx[:, None] * qry[None, :]).sum(-1, keepdims=True) / jnp.sqrt(jnp.float32(L))
        out = act4((scores * val[:, None]).mean(axis=2))           # (n, n_t, L)
        return nn.Dense(self.out_channels, name="proj_2")(act5(nn.Dense(self.n_hidden, name="proj_1")(out)))


class BipartiteReadOut(nn.Module):
    """Broadcast source-node embeddings back onto product nodes, gated by the
    detection mask. Ref: module.py:333-352. Returns (out, mask_per_prod)."""

    ndim_in: int = 30
    ndim_out: int = 15

    @nn.compact
    def __call__(self, src_feat, edge_feat, mask_out):
        # src_feat: (n_src, C); edge_feat: (n_src, n_sta, 3); mask_out: (n_src, 1)
        act1, act2 = PReLU(), PReLU()
        n_sta = edge_feat.shape[1]
        x_j = jnp.broadcast_to(src_feat[:, None, :], (src_feat.shape[0], n_sta, src_feat.shape[1]))
        msg = mask_out[:, None, :] * act1(nn.Dense(self.ndim_in, name="fc1")(jnp.concatenate((x_j, edge_feat), -1)))
        out = act2(nn.Dense(self.ndim_out, name="fc2")(msg))
        mask_prod = jnp.broadcast_to(mask_out[:, None, :], (src_feat.shape[0], n_sta, 1))
        return out, mask_prod


class DataAggregationAssociationPhase(nn.Module):
    """Second dual-relation conv for the association stage. Ref:
    module.py:356-403. Same structure as DataAggregation but the first-round
    propagate inputs pass through their linears (l1_*_1 used here).
    ``use_edges`` adds the updated-definition relative-position edge
    features (module.py:1069-1072 assigns the same embedded tables to this
    layer; dense reduction in :func:`mean_rel_pos_embed`)."""

    in_channels: int = 15
    out_channels: int = 15
    n_hidden: int = 30
    n_latent: int = 30
    via_matmul: bool = False
    use_edges: bool = False
    src_agg: Callable | None = None   # see DataAggregation.src_agg

    @nn.compact
    def __call__(self, tr, latent, mask1, mask2, sta_nbr, sta_nbr_valid,
                 src_nbr, rel_sta=None, rel_src=None):
        h = self.n_hidden
        act = PReLU()
        act11, act12, act1 = PReLU(), PReLU(), PReLU()
        act21, act22, act2 = PReLU(), PReLU(), PReLU()
        agg_over_src = self.src_agg or (
            lambda x: mean_src_axis(x, src_nbr, via_matmul=self.via_matmul))

        if self.use_edges:
            n_src, n_sta = tr.shape[:2]
            e_sta = jnp.broadcast_to(rel_sta[None], (n_src, n_sta, 4))
            e_src = jnp.broadcast_to(rel_src[:, None], (n_src, n_sta, 4))

        def cat_sta(a):
            return jnp.concatenate((a, e_sta), -1) if self.use_edges else a

        def cat_src(a):
            return jnp.concatenate((a, e_src), -1) if self.use_edges else a

        mask = jnp.concatenate((mask1, mask2), axis=-1)
        tr = jnp.concatenate((tr, latent, mask), axis=-1)
        tr = act(nn.Dense(h, name="init_trns")(tr))

        agg_sta = cat_sta(mean_sta_axis(act11(nn.Dense(h, name="l1_t1_1")(tr)), sta_nbr, sta_nbr_valid, self.via_matmul))
        agg_src = cat_src(agg_over_src(act12(nn.Dense(h, name="l1_t2_1")(tr))))
        tr1 = nn.Dense(h, name="l1_t1_2")(jnp.concatenate((tr, agg_sta, mask), -1))
        tr2 = nn.Dense(h, name="l1_t2_2")(jnp.concatenate((tr, agg_src, mask), -1))
        tr = act1(jnp.concatenate((tr1, tr2), axis=-1))

        agg_sta = cat_sta(mean_sta_axis(act21(nn.Dense(h, name="l2_t1_1")(tr)), sta_nbr, sta_nbr_valid, self.via_matmul))
        agg_src = cat_src(agg_over_src(act22(nn.Dense(h, name="l2_t2_1")(tr))))
        tr1 = nn.Dense(self.out_channels, name="l2_t1_2")(jnp.concatenate((tr, agg_sta, mask), -1))
        tr2 = nn.Dense(self.out_channels, name="l2_t2_2")(jnp.concatenate((tr, agg_src, mask), -1))
        return act2(jnp.concatenate((tr1, tr2), axis=-1))


class LocalSliceCollapse(nn.Module):
    """Per-pick embedding: gather the k product nodes whose theoretical
    arrival (for one phase) is nearest the pick time, mask to |Δt| < 2·eps,
    MLP + masked mean. Ref: module.py:610-659 (LocalSliceLgCollapse).

    The reference's flat time-pointer table (station × time-bin × k product
    indices with subset-relabelling arithmetic) becomes a per-station table of
    *source* indices — the station is implicit in the dense layout, so no
    relabelling is ever needed (SURVEY §7.3 'time-pointer' hard part).
    """

    ndim_in: int = 30
    ndim_out: int = 15
    n_hidden: int = 30
    eps: float = 15.0
    use_phase_types: bool = True

    @nn.compact
    def __call__(self, time_ptr, dt0, dt, tpick, ipick, phase_label, s, trv_phase, pick_mask):
        # time_ptr: (n_sta, n_dt, k) int32 source indices
        # s: (n_src, n_sta, C) association latents; trv_phase: (n_src, n_sta)
        act1, act2 = PReLU(), PReLU()
        n_dt, k = time_ptr.shape[1], time_ptr.shape[2]
        if not self.use_phase_types:
            phase_label = phase_label * 0.0
        t_index = jnp.clip(jnp.floor((tpick - dt0) / dt).astype(jnp.int32), 0, n_dt - 1)
        src_idx = time_ptr[ipick, t_index]                   # (n_pick, k)
        x_j = s[src_idx, ipick[:, None]]                     # (n_pick, k, C)
        t_theory = trv_phase[src_idx, ipick[:, None]]        # (n_pick, k)
        t_rel = tpick[:, None] - t_theory
        keep = (jnp.abs(t_rel) < 2.0 * self.eps) & pick_mask[:, None]
        phase = jnp.broadcast_to(phase_label[:, None, :], x_j.shape[:2] + (1,))
        msg = act1(nn.Dense(self.n_hidden, name="fc1")(
            jnp.concatenate((x_j, (t_rel / self.eps)[..., None], phase), -1)
        ))
        msg = msg * keep[..., None]
        cnt = jnp.maximum(keep.sum(axis=1, keepdims=True), 1)
        out = msg.sum(axis=1) / cnt
        return act2(nn.Dense(self.ndim_out, name="fc2")(out))


class _AssocChunk(nn.Module):
    """One query-source chunk of the association attention (scanned)."""

    ndim_out: int = 2
    n_latent: int = 15
    n_heads: int = 3
    n_hidden: int = 30
    eps: float = 15.0

    @nn.compact
    def __call__(self, carry, st, semb, trv_q, shared):
        (x_j, phase_j, at_j, sta_j, self_link, null_link, is_null,
         pair_valid) = shared
        act1, act2, act3, act4 = PReLU(), PReLU(), PReLU(), PReLU()
        H, L, eps = self.n_heads, self.n_latent, self.eps
        n_pick = x_j.shape[0]

        # rel times: (c, n_pick, Kp)
        tsrc_p = jnp.where(is_null[None], -eps, trv_q[:, :, 0][:, sta_j])
        tsrc_s = jnp.where(is_null[None], -eps, trv_q[:, :, 1][:, sta_j])
        rel_p = at_j[None] - (tsrc_p + st[:, None, None])
        rel_s = at_j[None] - (tsrc_s + st[:, None, None])
        keep = ((jnp.abs(rel_p) < 2.0 * eps) | (jnp.abs(rel_s) < 2.0 * eps))
        keep = keep & pair_valid[None]

        def feat(rel):
            return jnp.concatenate(
                (jnp.exp(-0.5 * rel[..., None] ** 2 / eps**2),
                 jnp.sign(rel)[..., None],
                 jnp.broadcast_to(phase_j[None], rel.shape + (1,))),
                axis=-1,
            )
        fp, fs = feat(rel_p), feat(rel_s)
        c = st.shape[0]
        x_jb = jnp.broadcast_to(x_j[None], (c,) + x_j.shape)
        sl = jnp.broadcast_to(self_link[None], (c,) + self_link.shape)
        nl = jnp.broadcast_to(null_link[None], (c,) + null_link.shape)

        q = nn.Dense(H * L, name="f_arrival_query_2")(act2(
            nn.Dense(self.n_hidden, name="f_arrival_query_1")(
                jnp.concatenate((x_jb, fp, fs), -1))))
        q = q.reshape(c, n_pick, -1, H, L)
        ctx_in = jnp.concatenate(
            (jnp.broadcast_to(semb[:, None, None, :], (c, n_pick, q.shape[2], semb.shape[-1])),
             jnp.broadcast_to(st[:, None, None, None], (c, n_pick, q.shape[2], 1)),
             sl, nl), -1)
        ctx = nn.Dense(H * L, name="f_src_context_2")(act1(
            nn.Dense(self.n_hidden, name="f_src_context_1")(ctx_in)))
        ctx = ctx.reshape(c, n_pick, -1, H, L)
        v = nn.Dense(H * L, name="f_values_2")(act3(
            nn.Dense(self.n_hidden, name="f_values_1")(
                jnp.concatenate((x_jb, fp, fs, sl, nl), -1))))
        v = v.reshape(c, n_pick, -1, H, L)

        scores = (q * ctx).sum(-1) / jnp.sqrt(jnp.float32(L))   # (c, n_pick, Kp, H)
        scores = jnp.where(keep[..., None], scores, -jnp.inf)
        alpha = jax.nn.softmax(scores, axis=2)
        alpha = jnp.where(jnp.isfinite(alpha), alpha, 0.0)      # all-masked rows
        agg = (alpha[..., None] * v).sum(axis=2).mean(axis=2)   # (c, n_pick, L)
        out = nn.Dense(self.ndim_out, name="proj_2")(act4(
            nn.Dense(self.n_hidden, name="proj_1")(agg)))
        return carry, out


class StationSourceAttention(nn.Module):
    """Final association head: for each (query source, pick) the model
    attends over the pick's co-station picks (+ a null sink), scoring P/S
    membership. Ref: module.py:662-775 (StationSourceAttentionMergedPhases).

    The reference's per-station all-pairs edge list with time-window
    sparsification becomes a fixed-size co-pick table ``pair_idx`` of the
    K_pair nearest-in-time picks at the same station, plus one null slot —
    dense masked attention over that axis. Query sources are processed in
    ``src_chunk``-sized chunks under ``nn.scan`` (one compiled body, bounded
    memory)."""

    ndim_src_in: int = 30
    ndim_arv_in: int = 15
    ndim_out: int = 2
    n_latent: int = 15
    n_heads: int = 3
    n_hidden: int = 30
    eps: float = 15.0
    use_phase_types: bool = True
    src_chunk: int = 16

    @nn.compact
    def __call__(self, stime, src_embed, trv_src, arv_p, arv_s, tpick, ipick,
                 phase_label, pair_idx, pair_valid, pick_mask):
        """
        stime: (n_qsrc,) query origin times; src_embed: (n_qsrc, C_src)
        trv_src: (n_qsrc, n_sta, 2) theoretical times at query sources
        arv_p/arv_s: (n_pick, C_arv) pick embeddings
        pair_idx: (n_pick, Kp) co-station pick indices; slot value == n_pick
          denotes the null arrival; pair_valid masks padded slots.
        Returns (n_qsrc, n_pick, 2).
        """
        n_pick = tpick.shape[0]
        eps = self.eps
        if not self.use_phase_types:
            phase_label = phase_label * 0.0

        # Augmented ("null"-extended) pick arrays
        arrival = jnp.concatenate((arv_p, arv_s), axis=-1)
        arrival = jnp.concatenate((arrival, jnp.zeros((1, arrival.shape[1]), arrival.dtype)), axis=0)
        atime = jnp.concatenate((tpick, jnp.asarray([-eps], tpick.dtype)))
        phase_aug = jnp.concatenate((phase_label, -jnp.ones((1, 1), phase_label.dtype)), axis=0)

        j_idx = pair_idx                       # (n_pick, Kp); == n_pick → null
        is_null = (j_idx == n_pick)
        x_j = arrival[j_idx]                   # (n_pick, Kp, 2*C_arv)
        phase_j = phase_aug[j_idx]             # (n_pick, Kp, 1)
        at_j = atime[j_idx]                    # (n_pick, Kp)
        # theoretical times at the *sender* pick's station; null → -eps column
        sta_j = jnp.where(is_null, 0, ipick[j_idx])  # dummy station for null
        self_link = (j_idx == jnp.arange(n_pick)[:, None]).astype(jnp.float32)[..., None]
        null_link = is_null.astype(jnp.float32)[..., None]
        shared = (x_j, phase_j, at_j, sta_j, self_link, null_link, is_null,
                  pair_valid)

        n_qsrc = stime.shape[0]
        cs = self.src_chunk
        n_chunks = -(-n_qsrc // cs)
        pad = n_chunks * cs - n_qsrc
        st_p = jnp.pad(stime, (0, pad)).reshape(n_chunks, cs)
        se_p = jnp.pad(src_embed, ((0, pad), (0, 0))).reshape(n_chunks, cs, -1)
        tq_p = jnp.pad(trv_src, ((0, pad), (0, 0), (0, 0))).reshape(
            n_chunks, cs, trv_src.shape[1], 2)

        Scan = nn.scan(
            _AssocChunk,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(0, 0, 0, nn.broadcast),
            out_axes=0,
        )
        _, out = Scan(
            ndim_out=self.ndim_out, n_latent=self.n_latent,
            n_heads=self.n_heads, n_hidden=self.n_hidden, eps=eps,
            name="chunks",
        )(None, st_p, se_p, tq_p, shared)
        out = out.reshape(n_chunks * cs, n_pick, self.ndim_out)
        return out[:n_qsrc]
