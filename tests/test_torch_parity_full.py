"""FULL-detector forward parity: the composed Detector.__call__ vs an
independent plain-torch edge-list implementation of every stage
(ref GCN_Detection_Network_extended, module.py:880-1186) with transplanted
weights — validating the composition glue (mask thresholds, edge features,
time-pointer plumbing, query attachment, chunked association) on top of the
per-layer parity of test_torch_parity(_more).py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from genie_tpu.graphs.build import (
    build_pair_table,
    build_query_attachment,
    build_source_graph,
    build_station_graph,
    build_time_pointers,
)
from genie_tpu.models.detector import Detector, GraphBundle, PickSet, QuerySet
from test_torch_parity import lin, prelu, product_edges, scatter_mean, t
from test_torch_parity_more import (
    _station_source_attention_torch_ref,
    scatter_add,
)

torch.manual_seed(0)
ATOL = 2e-4  # composed float32 chains accumulate a little more roundoff


def torch_data_agg(p, tr, m, e_sta, e_src, N, use_l1=False):
    """DataAggregation (l1_*_1 unused) / AssociationPhase (use_l1=True)."""
    A = [p[f"PReLU_{i}"] for i in range(7)]
    tr = prelu(A[0], lin(p["init_trns"], tr))
    if use_l1:
        a_sta = scatter_mean(prelu(A[1], lin(p["l1_t1_1"], tr))[e_sta[0]], e_sta[1], N)
        a_src = scatter_mean(prelu(A[2], lin(p["l1_t2_1"], tr))[e_src[0]], e_src[1], N)
    else:
        a_sta = scatter_mean(prelu(A[1], tr)[e_sta[0]], e_sta[1], N)
        a_src = scatter_mean(prelu(A[2], tr)[e_src[0]], e_src[1], N)
    tr1 = lin(p["l1_t1_2"], torch.cat((tr, a_sta, m), -1))
    tr2 = lin(p["l1_t2_2"], torch.cat((tr, a_src, m), -1))
    tr = prelu(A[3], torch.cat((tr1, tr2), -1))
    a_sta = scatter_mean(prelu(A[4], lin(p["l2_t1_1"], tr))[e_sta[0]], e_sta[1], N)
    a_src = scatter_mean(prelu(A[5], lin(p["l2_t2_1"], tr))[e_src[0]], e_src[1], N)
    tr1 = lin(p["l2_t1_2"], torch.cat((tr, a_sta, m), -1))
    tr2 = lin(p["l2_t2_2"], torch.cat((tr, a_src, m), -1))
    return prelu(A[6], torch.cat((tr1, tr2), -1))


def torch_spatial_agg(p, x, src_nbr, pos, scale_rel):
    a3, a1, a2 = p["PReLU_0"], p["PReLU_1"], p["PReLU_2"]
    n_src = x.shape[0]
    edges = [(int(src_nbr[s, kk]), s) for s in range(n_src)
             for kk in range(src_nbr.shape[1])]
    e = torch.tensor(edges, dtype=torch.long).T
    pos_t = t(pos) / scale_rel
    x_j = x[e[0]]
    glob = prelu(a3, lin(p["fglobal"], x_j)).mean(0, keepdim=True).repeat(len(edges), 1)
    msg = prelu(a1, lin(p["fc1"], torch.cat((x_j, pos_t[e[1]] - pos_t[e[0]], glob), -1)))
    agg = scatter_mean(msg, e[1], n_src)
    return prelu(a2, lin(p["fc2"], torch.cat((x, agg), -1)))


def torch_spatial_attn(p, x_ctx, ctx_idx, ctx_pos, q_pos, scale_rel, H=5, L=15):
    a1, a2 = p["PReLU_0"], p["PReLU_1"]
    n_q, k = ctx_idx.shape
    edges = [(int(ctx_idx[i, kk]), i) for i in range(n_q) for kk in range(k)]
    e = torch.tensor(edges, dtype=torch.long).T
    attr = (t(q_pos)[e[1]] - t(ctx_pos)[e[0]]) / scale_rel
    q = lin(p["f_queries"], attr).view(-1, H, L)
    c = lin(p["f_context"], torch.cat((x_ctx[e[0]], attr), -1)).view(-1, H, L)
    v = lin(p["f_values"], torch.cat((x_ctx[e[0]], attr), -1)).view(-1, H, L)
    alpha = prelu(a1, (q * c).sum(-1) / np.sqrt(L))
    amax = torch.full((n_q, H), -torch.inf)
    for j, (_, i) in enumerate(edges):
        amax[i] = torch.maximum(amax[i], alpha[j])
    ex = torch.exp(alpha - amax[e[1]])
    den = scatter_add(ex, e[1], n_q)
    agg = scatter_add((ex / den[e[1]]).unsqueeze(-1) * v, e[1], n_q)
    return prelu(a2, lin(p["proj"], agg.mean(1)))


def torch_temporal_attn(p, x, tq, scale_t, H=5, L=15):
    A = [p[f"PReLU_{i}"] for i in range(5)]
    n, n_t = x.shape[0], tq.shape[0]
    ctx = lin(p["f_context_2"], prelu(A[0], lin(p["f_context_1"], x))).view(n, H, L)
    val = lin(p["f_values_2"], prelu(A[1], lin(p["f_values_1"], x))).view(n, H, L)
    qry = lin(p["temporal_query_2"],
              prelu(A[2], lin(p["temporal_query_1"], t(tq) / scale_t))).view(n_t, H, L)
    sc = (ctx.unsqueeze(1) * qry.unsqueeze(0)).sum(-1, keepdim=True) / np.sqrt(L)
    out = prelu(A[3], (sc * val.unsqueeze(1)).mean(2))
    return lin(p["proj_2"], prelu(A[4], lin(p["proj_1"], out)))


def torch_slice(p, ptr, dt0, dt, tpick, ipick, phase, s_flat, trv_ph, eps,
                n_sta):
    a1, a2 = p["PReLU_0"], p["PReLU_1"]
    n_dt, k = ptr.shape[1], ptr.shape[2]
    n_pick = len(tpick)
    A_edges = (np.asarray(ptr) * n_sta + np.arange(n_sta)[:, None, None]).reshape(-1)
    tlat = trv_ph.reshape(-1)
    t_index = np.floor((tpick - dt0) / dt).astype(np.int64)
    t_index = ((ipick * n_dt * k + t_index * k)[:, None] + np.arange(k)[None]).reshape(-1)
    src_index = np.repeat(np.arange(n_pick), k)
    sl = np.stack((A_edges[t_index], src_index))
    t_rel = tpick[sl[1]] - tlat[sl[0]]
    sl = sl[:, np.abs(t_rel) < 2.0 * eps]
    msg = prelu(a1, lin(p["fc1"], torch.cat((
        s_flat[sl[0]],
        t((tpick[sl[1]] - tlat[sl[0]]) / eps).unsqueeze(1),
        t(phase[sl[1]])), -1)))
    agg = scatter_mean(msg, torch.as_tensor(sl[1]), n_pick)
    return prelu(a2, lin(p["fc2"], agg))


def test_full_detector_forward_parity():
    rng = np.random.default_rng(9)
    n_sta, n_src, n_pick, n_q, n_qsrc, n_t = 8, 24, 12, 10, 4, 5
    kernel_sig_t = 3.0
    scale_rel = 30e3
    eps, scale_t = 5 * kernel_sig_t, 3 * kernel_sig_t

    sta_pos = rng.uniform(-40e3, 40e3, (n_sta, 3)).astype(np.float32)
    src_pos = rng.uniform(-60e3, 60e3, (n_src, 3)).astype(np.float32)
    src_pos[:, 2] = rng.uniform(-25e3, 0, n_src)
    d = np.linalg.norm(src_pos[:, None] - sta_pos[None], axis=-1)
    trv = np.stack((d / 5500.0, d / 3100.0), -1).astype(np.float32)

    sta_nbr, sta_valid = build_station_graph(sta_pos, 3)
    src_nbr = build_source_graph(src_pos, 5)
    ptr_p, ptr_s, dt0, dt, n_dt = build_time_pointers(trv, dt=1.0, k=4, win=10.0)
    edge_feat = ((src_pos[:, None] - sta_pos[None]) / 100e3).astype(np.float32)
    feat = (rng.random((n_src, n_sta, 4)).astype(np.float32) * 0.6)
    mask = (feat > 0.25).astype(np.float32)
    sta_mask = np.ones(n_sta, bool)

    tpick = rng.uniform(dt0 + 1, dt0 + (n_dt - 2) * 1.0, n_pick).astype(np.float32)
    ipick = rng.integers(0, n_sta, n_pick).astype(np.int32)
    phase = rng.integers(0, 2, (n_pick, 1)).astype(np.float32)
    pick_mask = np.ones(n_pick, bool)
    pair_idx, pair_valid = build_pair_table(
        jnp.asarray(tpick), jnp.asarray(ipick), jnp.asarray(pick_mask),
        k_pair=n_pick)

    x_query = rng.uniform(-60e3, 60e3, (n_q, 3)).astype(np.float32)
    x_qsrc = rng.uniform(-60e3, 60e3, (n_qsrc, 3)).astype(np.float32)
    xq_idx = build_query_attachment(jnp.asarray(src_pos), jnp.asarray(x_query), k=5)
    xqs_idx = build_query_attachment(jnp.asarray(src_pos), jnp.asarray(x_qsrc), k=5)
    t_query = np.linspace(-scale_t, scale_t, n_t).reshape(-1, 1).astype(np.float32)
    tq_sample = rng.uniform(5, 25, n_qsrc).astype(np.float32)
    dq = np.linalg.norm(x_qsrc[:, None] - sta_pos[None], axis=-1)
    trv_qsrc = np.stack((dq / 5500.0, dq / 3100.0), -1).astype(np.float32)

    graph = GraphBundle(
        sta_nbr=sta_nbr, sta_nbr_valid=sta_valid, src_nbr=src_nbr,
        sta_mask=jnp.asarray(sta_mask), edge_feat=jnp.asarray(edge_feat),
        src_pos=jnp.asarray(src_pos), time_ptr_p=ptr_p, time_ptr_s=ptr_s,
        dt0=jnp.float32(dt0), dt=jnp.float32(dt), trv=jnp.asarray(trv))
    picks = PickSet(jnp.asarray(tpick), jnp.asarray(ipick), jnp.asarray(phase),
                    jnp.asarray(pick_mask), pair_idx, pair_valid)
    queries = QuerySet(jnp.asarray(x_query), xq_idx, jnp.asarray(t_query),
                       jnp.asarray(x_qsrc), xqs_idx, jnp.asarray(tq_sample),
                       jnp.asarray(trv_qsrc))

    model = Detector(src_chunk=3, kernel_sig_t=kernel_sig_t, scale_rel=scale_rel)
    params = model.init(jax.random.PRNGKey(4), jnp.asarray(feat),
                        jnp.asarray(mask), graph, jnp.asarray(sta_pos),
                        picks, queries)
    y, x_q, arv_p_o, arv_s_o = model.apply(
        params, jnp.asarray(feat), jnp.asarray(mask), graph,
        jnp.asarray(sta_pos), picks, queries)

    # ---------------- torch edge-list composition ----------------
    P = params["params"]
    N = n_src * n_sta
    e_sta, e_src = product_edges(np.asarray(sta_nbr), np.asarray(sta_valid),
                                 np.asarray(src_nbr), n_src, n_sta)
    m_flat = t(mask).reshape(N, -1)
    tr0 = torch.cat((t(feat).reshape(N, -1), m_flat), -1)
    x_latent = torch_data_agg(P["data_agg"], tr0, m_flat, e_sta, e_src, N)

    # read-in (sum over stations gated by pick presence)
    pri = P["read_in"]
    msg = m_flat.max(1, keepdim=True)[0] * prelu(
        pri["PReLU_0"], lin(pri["fc1"], torch.cat(
            (x_latent, t(edge_feat).reshape(N, -1)), -1)))
    e_ri = torch.tensor([(s * n_sta + i, s) for s in range(n_src)
                         for i in range(n_sta)], dtype=torch.long).T
    x_node = prelu(pri["PReLU_1"], lin(pri["fc2"], scatter_add(msg[e_ri[0]], e_ri[1], n_src)))

    x_sp = torch_spatial_agg(P["spatial1"], x_node, np.asarray(src_nbr), src_pos, scale_rel)
    x_sp = torch_spatial_agg(P["spatial2"], x_sp, np.asarray(src_nbr), src_pos, scale_rel)
    x_sp = torch_spatial_agg(P["spatial3"], x_sp, np.asarray(src_nbr), src_pos, scale_rel)
    y_lat = prelu(P["spatial_direct"]["PReLU_0"], lin(P["spatial_direct"]["f_direct"], x_sp))

    y_ref = torch_temporal_attn(P["temporal_attn"], y_lat, t_query, scale_t)
    xq_ctx = torch_spatial_attn(P["spatial_attn"], x_sp, np.asarray(xq_idx),
                                src_pos, x_query, scale_rel)
    xq_ref = torch_temporal_attn(P["temporal_attn"], xq_ctx, t_query, scale_t)
    x_src = torch_spatial_attn(P["spatial_attn"], x_sp, np.asarray(xqs_idx),
                               src_pos, x_qsrc, scale_rel)

    mask_out = (y_ref[:, :, 0].max(1, keepdim=True)[0] > 0.01).float()  # (n_src, 1)
    pro = P["read_out"]
    x_j = y_lat[e_ri[1]]  # broadcast source rows onto product nodes
    msg = mask_out[e_ri[1]] * prelu(pro["PReLU_0"], lin(pro["fc1"], torch.cat(
        (x_j, t(edge_feat).reshape(N, -1)), -1)))
    s_prod = prelu(pro["PReLU_1"], lin(pro["fc2"], msg))
    mask_prod = mask_out[e_ri[1]]

    s_in = torch.cat((s_prod, x_latent, mask_prod, m_flat), -1)
    s_assoc = torch_data_agg(P["assoc_agg"], s_in,
                             torch.cat((mask_prod, m_flat), -1),
                             e_sta, e_src, N, use_l1=True)

    arv_p = torch_slice(P["slice_p"], ptr_p, dt0, dt, tpick, ipick, phase,
                        s_assoc, np.asarray(trv[:, :, 0]), eps, n_sta)
    arv_s = torch_slice(P["slice_s"], ptr_s, dt0, dt, tpick, ipick, phase,
                        s_assoc, np.asarray(trv[:, :, 1]), eps, n_sta)

    arv = _station_source_attention_torch_ref(
        P["arrivals"]["chunks"], tq_sample, x_src.detach().numpy(), trv_qsrc,
        arv_p.detach().numpy(), arv_s.detach().numpy(), tpick, ipick, phase,
        eps=eps)

    np.testing.assert_allclose(np.asarray(y), y_ref.detach().numpy(),
                               atol=ATOL, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(x_q), xq_ref.detach().numpy(),
                               atol=ATOL, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(arv_p_o)[:, :, 0], arv[:, :, 0],
                               atol=ATOL, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(arv_s_o)[:, :, 0], arv[:, :, 1],
                               atol=ATOL, rtol=1e-4)
