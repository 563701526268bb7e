"""Per-layer torch parity for the six layers round 2 left uncovered
(VERDICT item 5): BipartiteReadIn, SpatialDirect, SpatialAttention,
BipartiteReadOut, DataAggregationAssociationPhase, and — above all —
StationSourceAttention vs an edge-list itertools reference of
``StationSourceAttentionMergedPhases`` (module.py:662-775), whose
K_pair-table redesign is the layer most at risk of silent divergence.

The torch side re-expresses the reference's PyG MessagePassing semantics
(edge lists + scatter + per-group softmax) in plain torch loops with nothing
in common with the dense JAX path; weights are transplanted from the Flax
init so both sides compute with identical parameters.
"""

import itertools

import numpy as np
import jax
import jax.numpy as jnp
import torch

from genie_tpu.graphs.build import build_pair_table
from genie_tpu.models.layers import (
    BipartiteReadIn,
    BipartiteReadOut,
    DataAggregationAssociationPhase,
    SpatialAttention,
    SpatialDirect,
    StationSourceAttention,
)
from test_torch_parity import lin, make_scene, prelu, product_edges, scatter_mean, t

torch.manual_seed(0)
ATOL = 1e-4


def scatter_add(msg, dst, n):
    out = torch.zeros((n,) + msg.shape[1:])
    out.index_add_(0, dst, msg)
    return out


def test_bipartite_read_in_parity():
    """Ref module.py:214-229 (BipartiteGraphOperator): per-product-node
    message gated by pick-presence max, 'add'-aggregated onto source nodes
    over A_src_in_edges. Station masking = those product nodes simply absent
    from the reference edge list."""
    rng = np.random.default_rng(10)
    n_src, n_sta = 25, 9
    x = rng.random((n_src, n_sta, 30)).astype(np.float32)
    edge_feat = rng.uniform(-1, 1, (n_src, n_sta, 3)).astype(np.float32)
    mask = (rng.random((n_src, n_sta, 4)) > 0.5).astype(np.float32)
    sta_mask = np.ones(n_sta, bool)
    sta_mask[[2, 7]] = False  # padded stations: absent from the ref edge list

    layer = BipartiteReadIn(30, 15)
    args = (jnp.asarray(x), jnp.asarray(edge_feat), jnp.asarray(mask),
            jnp.asarray(sta_mask))
    params = layer.init(jax.random.PRNGKey(1), *args)
    ours = np.asarray(layer.apply(params, *args))

    p = params["params"]
    a1, a2 = p["PReLU_0"], p["PReLU_1"]
    N = n_src * n_sta
    inpt = torch.cat((t(x).reshape(N, -1), t(edge_feat).reshape(N, -1)), -1)
    msg = t(mask).reshape(N, -1).max(1, keepdim=True)[0] * prelu(a1, lin(p["fc1"], inpt))
    e = [(s * n_sta + i, s) for s in range(n_src) for i in range(n_sta) if sta_mask[i]]
    e = torch.tensor(e, dtype=torch.long).T
    agg = scatter_add(msg[e[0]], e[1], n_src)
    ref = prelu(a2, lin(p["fc2"], agg)).numpy()
    np.testing.assert_allclose(ours, ref, atol=ATOL, rtol=1e-4)


def test_spatial_direct_parity():
    """Ref module.py:251-260."""
    rng = np.random.default_rng(11)
    x = rng.random((25, 30)).astype(np.float32)
    layer = SpatialDirect(30)
    params = layer.init(jax.random.PRNGKey(2), jnp.asarray(x))
    ours = np.asarray(layer.apply(params, jnp.asarray(x)))
    p = params["params"]
    ref = prelu(p["PReLU_0"], lin(p["f_direct"], t(x))).numpy()
    np.testing.assert_allclose(ours, ref, atol=ATOL, rtol=1e-4)


def test_spatial_attention_parity():
    """Ref module.py:262-297: multi-head knn cross-attention grid -> query
    coordinates; torch side = edge-list messages + per-query softmax +
    scatter-add, over the same k=10 nearest-context table."""
    rng = np.random.default_rng(12)
    n_ctx, n_q, k = 25, 40, 10
    ctx_pos = rng.uniform(-50e3, 50e3, (n_ctx, 3)).astype(np.float32)
    query_pos = rng.uniform(-50e3, 50e3, (n_q, 3)).astype(np.float32)
    x = rng.random((n_ctx, 30)).astype(np.float32)
    d = np.linalg.norm(query_pos[:, None] - ctx_pos[None], axis=-1)
    ctx_idx = np.argsort(d, axis=1)[:, :k]  # == ref knn(x_context, x_query)

    layer = SpatialAttention(30, 30, n_latent=15, n_heads=5, scale_rel=30e3)
    args = (jnp.asarray(x), jnp.asarray(ctx_idx), jnp.asarray(ctx_pos),
            jnp.asarray(query_pos))
    params = layer.init(jax.random.PRNGKey(3), *args)
    ours = np.asarray(layer.apply(params, *args))

    p = params["params"]
    a1, a2 = p["PReLU_0"], p["PReLU_1"]
    H, L = 5, 15
    edges = [(int(ctx_idx[i, kk]), i) for i in range(n_q) for kk in range(k)]
    e = torch.tensor(edges, dtype=torch.long).T
    edge_attr = (t(query_pos)[e[1]] - t(ctx_pos)[e[0]]) / 30e3
    q = lin(p["f_queries"], edge_attr).view(-1, H, L)
    c = lin(p["f_context"], torch.cat((t(x)[e[0]], edge_attr), -1)).view(-1, H, L)
    v = lin(p["f_values"], torch.cat((t(x)[e[0]], edge_attr), -1)).view(-1, H, L)
    alpha = prelu(a1, (q * c).sum(-1) / np.sqrt(L))      # (E, H)
    # per-query softmax (PyG softmax(alpha, index))
    amax = torch.full((n_q, H), -torch.inf)
    for j, (_, i) in enumerate(edges):
        amax[i] = torch.maximum(amax[i], alpha[j])
    ex = torch.exp(alpha - amax[e[1]])
    den = scatter_add(ex, e[1], n_q)
    sm = ex / den[e[1]]
    agg = scatter_add(sm.unsqueeze(-1) * v, e[1], n_q)    # (n_q, H, L)
    ref = prelu(a2, lin(p["proj"], agg.mean(1))).numpy()
    np.testing.assert_allclose(ours, ref, atol=ATOL, rtol=1e-4)


def test_bipartite_read_out_parity():
    """Ref module.py:333-352: broadcast source embeddings onto product nodes
    gated by the detection mask; one edge per product node."""
    rng = np.random.default_rng(13)
    n_src, n_sta = 25, 9
    src_feat = rng.random((n_src, 30)).astype(np.float32)
    edge_feat = rng.uniform(-1, 1, (n_src, n_sta, 3)).astype(np.float32)
    mask_out = (rng.random((n_src, 1)) > 0.4).astype(np.float32)

    layer = BipartiteReadOut(30, 15)
    args = (jnp.asarray(src_feat), jnp.asarray(edge_feat), jnp.asarray(mask_out))
    params = layer.init(jax.random.PRNGKey(4), *args)
    ours, ours_mask = layer.apply(params, *args)

    p = params["params"]
    a1, a2 = p["PReLU_0"], p["PReLU_1"]
    x_j = t(src_feat)[:, None, :].expand(n_src, n_sta, 30)
    msg = t(mask_out)[:, None, :] * prelu(a1, lin(p["fc1"], torch.cat((x_j, t(edge_feat)), -1)))
    ref = prelu(a2, lin(p["fc2"], msg)).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=ATOL, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(ours_mask)[:, 0, 0], mask_out[:, 0], atol=0)


def test_data_aggregation_association_phase_parity():
    """Ref module.py:356-403: the association-stage dual-relation conv —
    same as DataAggregation but round 1 passes through l1_*_1 and input is
    (state, detached latent, two masks)."""
    sta_pos, src_pos, sta_nbr, sta_valid, src_nbr, feat, _ = make_scene(14)
    n_src, n_sta = feat.shape[:2]
    rng = np.random.default_rng(15)
    tr_in = rng.random((n_src, n_sta, 15)).astype(np.float32)
    latent = rng.random((n_src, n_sta, 30)).astype(np.float32)
    mask1 = (rng.random((n_src, n_sta, 4)) > 0.5).astype(np.float32)
    mask2 = (rng.random((n_src, n_sta, 1)) > 0.5).astype(np.float32)

    layer = DataAggregationAssociationPhase(15, 15)
    args = (jnp.asarray(tr_in), jnp.asarray(latent), jnp.asarray(mask1),
            jnp.asarray(mask2), jnp.asarray(sta_nbr), jnp.asarray(sta_valid),
            jnp.asarray(src_nbr))
    params = layer.init(jax.random.PRNGKey(5), *args)
    ours = np.asarray(layer.apply(params, *args))

    p = params["params"]
    A = [p[f"PReLU_{i}"] for i in range(7)]  # act, act11, act12, act1, act21, act22, act2
    e_sta, e_src = product_edges(sta_nbr, sta_valid, src_nbr, n_src, n_sta)
    N = n_src * n_sta
    m = torch.cat((t(mask1).reshape(N, -1), t(mask2).reshape(N, -1)), -1)
    tr = torch.cat((t(tr_in).reshape(N, -1), t(latent).reshape(N, -1), m), -1)
    tr = prelu(A[0], lin(p["init_trns"], tr))
    agg_sta = scatter_mean(prelu(A[1], lin(p["l1_t1_1"], tr))[e_sta[0]], e_sta[1], N)
    agg_src = scatter_mean(prelu(A[2], lin(p["l1_t2_1"], tr))[e_src[0]], e_src[1], N)
    tr1 = lin(p["l1_t1_2"], torch.cat((tr, agg_sta, m), -1))
    tr2 = lin(p["l1_t2_2"], torch.cat((tr, agg_src, m), -1))
    tr = prelu(A[3], torch.cat((tr1, tr2), -1))
    agg_sta = scatter_mean(prelu(A[4], lin(p["l2_t1_1"], tr))[e_sta[0]], e_sta[1], N)
    agg_src = scatter_mean(prelu(A[5], lin(p["l2_t2_1"], tr))[e_src[0]], e_src[1], N)
    tr1 = lin(p["l2_t1_2"], torch.cat((tr, agg_sta, m), -1))
    tr2 = lin(p["l2_t2_2"], torch.cat((tr, agg_src, m), -1))
    ref = prelu(A[6], torch.cat((tr1, tr2), -1)).numpy().reshape(n_src, n_sta, -1)
    np.testing.assert_allclose(ours, ref, atol=ATOL, rtol=1e-4)


def _station_source_attention_torch_ref(p, stime, src_embed, trv_src, arv_p,
                                        arv_s, tpick, ipick, phase, eps=15.0,
                                        H=3, L=15):
    """Edge-list reference of module.py:662-775: per-station itertools
    all-pairs pick edges + null sink, duplicated per query source, 2·eps
    either-phase sparsification, per-(source, pick) softmax, 'add'
    aggregation, mean over heads, proj chain."""
    n_qsrc, n_sta = trv_src.shape[:2]
    n_pick = len(tpick)
    # PReLU order in _AssocChunk: act1 (context), act2 (query), act3
    # (values), act4 (proj) == reference activate1..activate4
    a_ctx, a_qry, a_val, a_prj = (p["PReLU_0"], p["PReLU_1"], p["PReLU_2"],
                                  p["PReLU_3"])
    arrival = torch.cat(
        (torch.cat((t(arv_p), torch.zeros(1, arv_p.shape[1])), 0),
         torch.cat((t(arv_s), torch.zeros(1, arv_s.shape[1])), 0)), 1)
    atime = np.concatenate((tpick, [-eps]))
    phase_aug = np.concatenate((phase[:, 0], [-1.0]))

    out = np.zeros((n_qsrc, n_pick, 2), np.float32)
    for q in range(n_qsrc):
        for a in range(n_pick):
            senders = [b for b in range(n_pick) if ipick[b] == ipick[a]] + [n_pick]
            rows, feats_q, feats_v, feats_c = [], [], [], []
            for b in senders:
                tp = -eps if b == n_pick else trv_src[q, ipick[b], 0]
                ts = -eps if b == n_pick else trv_src[q, ipick[b], 1]
                rel_p = atime[b] - (tp + stime[q])
                rel_s = atime[b] - (ts + stime[q])
                if not (abs(rel_p) < 2 * eps or abs(rel_s) < 2 * eps):
                    continue  # sparsified away (module.py:724-729)
                fp = [np.exp(-0.5 * rel_p**2 / eps**2), np.sign(rel_p), phase_aug[b]]
                fs = [np.exp(-0.5 * rel_s**2 / eps**2), np.sign(rel_s), phase_aug[b]]
                self_link = float(b == a)
                null_link = float(b == n_pick)
                x_j = arrival[b]
                feats_q.append(torch.cat((x_j, torch.tensor(fp + fs, dtype=torch.float32))))
                feats_c.append(torch.cat((t(src_embed[q]),
                                          torch.tensor([stime[q], self_link, null_link],
                                                       dtype=torch.float32))))
                feats_v.append(torch.cat((x_j, torch.tensor(
                    fp + fs + [self_link, null_link], dtype=torch.float32))))
                rows.append(b)
            if rows:
                fq = torch.stack(feats_q)
                fc = torch.stack(feats_c)
                fv = torch.stack(feats_v)
                qv = lin(p["f_arrival_query_2"], prelu(a_qry, lin(p["f_arrival_query_1"], fq))).view(-1, H, L)
                cv = lin(p["f_src_context_2"], prelu(a_ctx, lin(p["f_src_context_1"], fc))).view(-1, H, L)
                vv = lin(p["f_values_2"], prelu(a_val, lin(p["f_values_1"], fv))).view(-1, H, L)
                scores = (qv * cv).sum(-1) / np.sqrt(L)          # (E, H)
                alpha = torch.softmax(scores, dim=0)
                agg = (alpha.unsqueeze(-1) * vv).sum(0).mean(0)   # (L,)
            else:
                agg = torch.zeros(L)
            out[q, a] = lin(p["proj_2"], prelu(a_prj, lin(p["proj_1"], agg))).numpy()
    return out


def test_station_source_attention_parity():
    """The K_pair co-pick-table redesign vs the reference's per-station
    itertools edge list (module.py:662-775). K_pair >= max co-picks per
    station makes the table exactly the all-pairs list, so outputs must
    match to float tolerance — including sparsified-away pairs, the null
    sink, self-links, and all-masked rows. src_chunk=2 on 5 query sources
    also exercises the nn.scan chunking + padding path."""
    rng = np.random.default_rng(16)
    n_pick, n_sta, n_qsrc, eps = 14, 5, 5, 15.0
    tpick = rng.uniform(0, 200, n_pick).astype(np.float32)
    ipick = rng.integers(0, n_sta, n_pick).astype(np.int32)
    phase = rng.integers(0, 2, (n_pick, 1)).astype(np.float32)
    arv_p = rng.random((n_pick, 15)).astype(np.float32)
    arv_s = rng.random((n_pick, 15)).astype(np.float32)
    stime = rng.uniform(0, 150, n_qsrc).astype(np.float32)
    src_embed = rng.random((n_qsrc, 30)).astype(np.float32)
    trv_src = rng.uniform(5, 80, (n_qsrc, n_sta, 2)).astype(np.float32)

    pick_mask = np.ones(n_pick, bool)
    pair_idx, pair_valid = build_pair_table(
        jnp.asarray(tpick), jnp.asarray(ipick), jnp.asarray(pick_mask),
        k_pair=n_pick)

    layer = StationSourceAttention(30, 15, 2, n_latent=15, n_heads=3,
                                   eps=eps, src_chunk=2)
    args = (jnp.asarray(stime), jnp.asarray(src_embed), jnp.asarray(trv_src),
            jnp.asarray(arv_p), jnp.asarray(arv_s), jnp.asarray(tpick),
            jnp.asarray(ipick), jnp.asarray(phase), pair_idx, pair_valid,
            jnp.asarray(pick_mask))
    params = layer.init(jax.random.PRNGKey(7), *args)
    ours = np.asarray(layer.apply(params, *args))

    p = params["params"]["chunks"]
    ref = _station_source_attention_torch_ref(
        p, stime, src_embed, trv_src, arv_p, arv_s, tpick, ipick, phase,
        eps=eps)
    assert ours.shape == ref.shape == (n_qsrc, n_pick, 2)
    np.testing.assert_allclose(ours, ref, atol=ATOL, rtol=1e-4)
