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


class RelocGraph(NamedTuple):
    """One static-shape relocation graph (S sources × n_sta_g stations).

    The station axis is the per-graph *observed* subset (the reference's
    subgraph-of-the-Cartesian-product, build_subsets_of_paired_sources.py:
    411-494): ``sta_sel`` indexes the full station array, obs arrays are
    already sliced to it. ``node_type`` is the 3-tier label of the source
    sampler (0 = seed, 1 = neighbour, 2 = second hop; ref :261-409) — loss
    pairs connect only tier-0/1 nodes."""

    src_pos: jnp.ndarray     # (S, 3) initial Cartesian positions
    src_time: jnp.ndarray    # (S,) origin times
    src_mask: jnp.ndarray    # (S,) bool
    node_type: jnp.ndarray   # (S,) int 0/1/2 (padding: 2)
    node_ids: jnp.ndarray    # (S,) global catalog indices (padding: 0)
    obs_time: jnp.ndarray    # (S, n_sta_g, 2) observed arrivals (absolute)
    obs_mask: jnp.ndarray    # (S, n_sta_g, 2) pick presence
    src_nbr: jnp.ndarray     # (S, k_src) source kNN within the graph
    sta_nbr: jnp.ndarray     # (n_sta_g, k_sta)
    sta_sel: jnp.ndarray     # (n_sta_g,) indices into the full station set
    sta_mask: jnp.ndarray    # (n_sta_g,) bool (False = padding row)
    pair_a: jnp.ndarray      # (n_pairs,) loss-edge source indices
    pair_b: jnp.ndarray      # (n_pairs,)
    pair_mask: jnp.ndarray   # (n_pairs,) bool
    # optional dt.cc differential-time observations (graph-local indices;
    # all-zero masks when unused — ref train_double_difference_model.py:
    # 654-689, 1010-1035)
    dt_a: jnp.ndarray = None        # (n_dt,) source a
    dt_b: jnp.ndarray = None        # (n_dt,) source b
    dt_sta: jnp.ndarray = None      # (n_dt,) station (graph-local)
    dt_ph: jnp.ndarray = None       # (n_dt,) phase 0/1
    dt_w: jnp.ndarray = None        # (n_dt,) weight
    dt_t: jnp.ndarray = None        # (n_dt,) observed differential time
    dt_mask: jnp.ndarray = None     # (n_dt,) bool
    # optional calibration reference (matched catalog events; ref
    # train_double_difference_model.py:830-854): pulls matched relocated
    # sources toward the reference locations in travel-time space
    ref_pos: jnp.ndarray = None     # (S, 3) reference Cartesian positions
    ref_time: jnp.ndarray = None    # (S,) reference origin times
    ref_mask: jnp.ndarray = None    # (S,) bool — True where matched


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


def select_sources_by_pick_budget(cnt_per_source, n_total: int):
    """Exact replacement of the reference's cvxpy ILP
    (``optimize_source_selection``, build_subsets_of_paired_sources.py:
    496-519): pick a source subset maximizing total pick count subject to
    total ≤ n_total. Because value == weight this is subset-sum, solved
    exactly by DP over the budget. Returns selected indices."""
    cnt = np.asarray(cnt_per_source, np.int64)
    budget = int(min(n_total, cnt.sum()))
    if budget <= 0:
        return np.zeros(0, np.int64)
    reach = np.zeros(budget + 1, bool)
    reach[0] = True
    choice = np.full((len(cnt), budget + 1), False)
    for i, c in enumerate(cnt):
        if c == 0 or c > budget:
            continue
        new = np.zeros_like(reach)
        new[c:] = reach[:-c]
        take = new & ~reach
        choice[i] = take
        reach |= new
    best = int(np.nonzero(reach)[0][-1])
    sel, b = [], best
    for i in range(len(cnt) - 1, -1, -1):
        if b > 0 and choice[i, b]:
            sel.append(i)
            b -= int(cnt[i])
    return np.asarray(sel[::-1], np.int64)


def _fixed_k_table(edges_a, edges_b, n_nodes, k, rng):
    """Sampled directed edge list (a → b receiver) → fixed-k per-receiver
    neighbour table, padded with self-loops."""
    tbl = np.tile(np.arange(n_nodes)[:, None], (1, k))
    for j in range(n_nodes):
        nb = np.unique(edges_a[edges_b == j])
        if len(nb) > k:
            nb = rng.choice(nb, k, replace=False)
        tbl[j, :len(nb)] = nb
    return tbl


def make_relocation_graphs(key, src_pos, src_time, obs_time, obs_mask, sta_cart,
                           n_graphs: int, graph_size: int = 32, k_src: int = 8,
                           k_sta: int = 8, max_pair_dist: float = 10e3,
                           n_pairs: int = 256, n_seed: int = 6,
                           max_src_pair_dist: float = 50e3,
                           sta_budget: int | None = None,
                           pick_budget: int | None = None):
    """Sample relocation graphs with the reference's 3-tier random source
    graph (build_subsets_of_paired_sources.py:261-409): ``n_seed`` random
    tier-0 sources, random neighbours within ``max_src_pair_dist`` (tier 1),
    their neighbours (tier 2, ~1/3 as many edges), extra edges among tiers
    0/1. Loss pairs connect only tier-0/1 nodes within ``max_pair_dist``.

    The station axis is restricted to the graph's *observed* stations,
    capped at ``sta_budget`` (ref subgraph product, :411-494). When the
    tiered node set exceeds ``graph_size``, sources are kept by the exact
    pick-budget selection (``pick_budget`` picks total; ref ILP :496-519) —
    seeds always survive.
    """
    n_src = src_pos.shape[0]
    rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 2**31 - 1)))
    src_pos_np = np.asarray(src_pos, np.float64)
    obs_mask_np = np.asarray(obs_mask)
    picks_per_src = obs_mask_np.sum(axis=(1, 2)).astype(np.int64)
    graphs = []

    d_all = None
    if n_src <= 4096:
        d_all = np.linalg.norm(src_pos_np[:, None] - src_pos_np[None], axis=-1)

    def neighbors_within(i):
        d = (d_all[i] if d_all is not None else
             np.linalg.norm(src_pos_np - src_pos_np[i], axis=1))
        nb = np.where((d < max_src_pair_dist) & (d > 0))[0]
        return nb

    for _ in range(n_graphs):
        seeds = rng.choice(n_src, size=min(n_seed, n_src), replace=False)
        tier1, tier2 = [], []
        edges = []                                  # (sender, receiver) global
        for s in seeds:
            nb = neighbors_within(s)
            if len(nb):
                ch = rng.choice(nb, min(k_src, len(nb)), replace=False)
                tier1.append(ch)
                edges.append(np.stack((ch, np.full(len(ch), s)), 1))
        tier1 = (np.setdiff1d(np.unique(np.concatenate(tier1)), seeds)
                 if tier1 else np.zeros(0, np.int64))
        k2 = max(1, k_src // 3)
        for s in tier1:
            nb = neighbors_within(s)
            if len(nb):
                ch = rng.choice(nb, min(k2, len(nb)), replace=False)
                tier2.append(ch)
                edges.append(np.stack((ch, np.full(len(ch), s)), 1))
        known = np.concatenate((seeds, tier1))
        tier2 = (np.setdiff1d(np.unique(np.concatenate(tier2)), known)
                 if tier2 else np.zeros(0, np.int64))

        ids = np.concatenate((seeds, tier1, tier2))
        types = np.concatenate((np.zeros(len(seeds), np.int64),
                                np.ones(len(tier1), np.int64),
                                np.full(len(tier2), 2, np.int64)))
        if len(ids) > graph_size:
            # keep all seeds; budget-select the rest by pick count
            rest = np.arange(len(seeds), len(ids))
            budget = (pick_budget if pick_budget is not None
                      else int(picks_per_src[ids[rest]].mean()
                               * (graph_size - len(seeds))))
            keep_rest = rest[select_sources_by_pick_budget(
                picks_per_src[ids[rest]], budget)]
            if len(keep_rest) > graph_size - len(seeds):
                keep_rest = rng.choice(keep_rest, graph_size - len(seeds),
                                       replace=False)
            keep = np.concatenate((np.arange(len(seeds)), np.sort(keep_rest)))
            ids, types = ids[keep], types[keep]

        S = len(ids)
        pad = graph_size - S
        sel = np.concatenate((ids, np.zeros(pad, np.int64)))
        smask = np.arange(graph_size) < S
        types_p = np.concatenate((types, np.full(pad, 2, np.int64)))
        pos_g = src_pos_np[sel].astype(np.float32)

        # observed-station subset (ref subgraph product): stations with ≥1
        # pick among the graph's sources, padded to a static budget
        om_g = obs_mask_np[sel] * smask[:, None, None]
        sta_obs = np.where(om_g.max(axis=(0, 2)) > 0)[0]
        n_sta_g = sta_budget or len(sta_cart)
        if len(sta_obs) > n_sta_g:
            order = np.argsort(-om_g.sum(axis=(0, 2))[sta_obs])
            sta_obs = np.sort(sta_obs[order[:n_sta_g]])
        sta_sel = np.zeros(n_sta_g, np.int64)
        sta_sel[:len(sta_obs)] = sta_obs
        sta_gmask = np.arange(n_sta_g) < len(sta_obs)

        sc_g = np.asarray(sta_cart)[sta_sel]
        sta_nbr, sta_valid = knn(jnp.asarray(sc_g) / 1000.0,
                                 jnp.asarray(sc_g) / 1000.0,
                                 min(k_sta + 1, n_sta_g),
                                 context_mask=jnp.asarray(sta_gmask))
        sta_nbr = np.asarray(sta_nbr)[:, 1:]

        # conv edges: the sampled tier edges (both directions) + extra edges
        # among tier-0/1 nodes within radius (ref add_missing_edges_upper_
        # levels, :367-380), as a fixed-k per-receiver table in local frame
        glob_to_loc = -np.ones(n_src, np.int64)
        glob_to_loc[ids] = np.arange(S)
        e = np.concatenate(edges, 0) if edges else np.zeros((0, 2), np.int64)
        ea, eb = glob_to_loc[e[:, 0]], glob_to_loc[e[:, 1]]
        keep_e = (ea >= 0) & (eb >= 0)
        ea, eb = ea[keep_e], eb[keep_e]
        up = np.where(types <= 1)[0]
        if len(up) > 1:
            du = np.linalg.norm(pos_g[up][:, None] - pos_g[up][None], axis=-1)
            ui, uj = np.where((du < max_src_pair_dist) & (du > 0))
            ea = np.concatenate((ea, up[ui]))
            eb = np.concatenate((eb, up[uj]))
        ea, eb = np.concatenate((ea, eb)), np.concatenate((eb, ea))  # symmetrize
        nbr_idx = _fixed_k_table(ea, eb, graph_size, k_src, rng)

        # loss pairs: tier-0/1 nodes only (ref ifind_edges1-4, :399-404)
        dd = np.linalg.norm(pos_g[:, None] - pos_g[None, :], axis=-1)
        upper = types_p <= 1
        ii, jj = np.where((dd < max_pair_dist) & (dd > 0)
                          & smask[:, None] & smask[None, :]
                          & upper[:, None] & upper[None, :])
        if len(ii) > n_pairs:
            pick = rng.choice(len(ii), n_pairs, replace=False)
            ii, jj = ii[pick], jj[pick]
        pa = np.zeros(n_pairs, np.int64)
        pb = np.zeros(n_pairs, np.int64)
        pmask = np.zeros(n_pairs, bool)
        pa[:len(ii)] = ii
        pb[:len(jj)] = jj
        pmask[:len(ii)] = True

        ot_g = np.asarray(obs_time)[sel][:, sta_sel]
        om_gs = om_g[:, sta_sel] * sta_gmask[None, :, None]

        graphs.append(RelocGraph(
            src_pos=jnp.asarray(pos_g, jnp.float32),
            src_time=jnp.asarray(np.asarray(src_time)[sel], jnp.float32),
            src_mask=jnp.asarray(smask),
            node_type=jnp.asarray(types_p, jnp.int32),
            node_ids=jnp.asarray(sel, jnp.int32),
            obs_time=jnp.asarray(ot_g, jnp.float32),
            obs_mask=jnp.asarray(om_gs, jnp.float32),
            src_nbr=jnp.asarray(nbr_idx, jnp.int32),
            sta_nbr=jnp.asarray(sta_nbr, jnp.int32),
            sta_sel=jnp.asarray(sta_sel, jnp.int32),
            sta_mask=jnp.asarray(sta_gmask),
            pair_a=jnp.asarray(pa, jnp.int32), pair_b=jnp.asarray(pb, jnp.int32),
            pair_mask=jnp.asarray(pmask),
            **_empty_dtcc(1),
        ))
    return graphs


def _empty_dtcc(n_dt: int):
    return dict(dt_a=jnp.zeros(n_dt, jnp.int32), dt_b=jnp.zeros(n_dt, jnp.int32),
                dt_sta=jnp.zeros(n_dt, jnp.int32), dt_ph=jnp.zeros(n_dt, jnp.int32),
                dt_w=jnp.zeros(n_dt, jnp.float32), dt_t=jnp.zeros(n_dt, jnp.float32),
                dt_mask=jnp.zeros(n_dt, bool))


def load_dtcc(path, sta_names):
    """Parse a HypoDD ``dt.cc`` cross-correlation differential-time file
    (ref train_double_difference_model.py:654-689). Returns dict of arrays:
    src_a, src_b (catalog ids), sta, ph, w, dt."""
    name_to_idx = {str(n): i for i, n in enumerate(np.asarray(sta_names))}
    a, b, sta, ph, w, dt = [], [], [], [], [], []
    cur = None
    from pathlib import Path
    for line in Path(path).read_text().splitlines():
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "#":
            cur = (int(parts[1]) - 1, int(parts[2]) - 1)
            continue
        if cur is None:
            raise ValueError("dt.cc pick line before any '#' pair line")
        if parts[0] not in name_to_idx:
            raise ValueError(f"dt.cc station {parts[0]!r} not in stations")
        if parts[3] not in ("P", "S"):
            raise ValueError(f"dt.cc phase must be P or S, got {parts[3]!r}")
        a.append(cur[0])
        b.append(cur[1])
        sta.append(name_to_idx[parts[0]])
        dt.append(float(parts[1]))
        w.append(float(parts[2]))
        ph.append(0 if parts[3] == "P" else 1)
    return {"src_a": np.asarray(a, np.int64), "src_b": np.asarray(b, np.int64),
            "sta": np.asarray(sta, np.int64), "ph": np.asarray(ph, np.int64),
            "w": np.asarray(w, np.float64), "dt": np.asarray(dt, np.float64)}


def attach_reference(graph: RelocGraph, matched_ids, ref_pos, ref_time):
    """Attach matched calibration-reference events (ref train_double_
    difference_model.py:830-854): ``matched_ids[i]`` is the global catalog id
    matched to reference event i (``ref_pos`` Cartesian, ``ref_time``
    absolute). Sources of the graph not matched get ref_mask False."""
    ids = np.asarray(graph.node_ids)
    smask = np.asarray(graph.src_mask)
    S = len(ids)
    rp = np.zeros((S, 3), np.float32)
    rt = np.zeros(S, np.float32)
    rm = np.zeros(S, bool)
    lookup = {int(g): i for i, g in enumerate(np.asarray(matched_ids))}
    for r in range(S):
        if smask[r] and int(ids[r]) in lookup:
            i = lookup[int(ids[r])]
            rp[r] = np.asarray(ref_pos)[i]
            rt[r] = np.asarray(ref_time)[i]
            rm[r] = True
    return graph._replace(ref_pos=jnp.asarray(rp), ref_time=jnp.asarray(rt),
                          ref_mask=jnp.asarray(rm))


def attach_dtcc(graph: RelocGraph, dtcc: dict, n_dt: int = 256):
    """Map global dt.cc observations into one graph's local indices (both
    sources and the station must be present; ref subgraph(...) :1012)."""
    ids = np.asarray(graph.node_ids)
    smask = np.asarray(graph.src_mask)
    sta_sel = np.asarray(graph.sta_sel)
    sta_gmask = np.asarray(graph.sta_mask)
    src_local = -np.ones(int(max(ids.max() + 1, dtcc["src_a"].max() + 1,
                                 dtcc["src_b"].max() + 1)), np.int64)
    src_local[ids[smask]] = np.where(smask)[0]
    sta_local = -np.ones(int(max(sta_sel.max() + 1, dtcc["sta"].max() + 1)),
                         np.int64)
    sta_local[sta_sel[sta_gmask]] = np.where(sta_gmask)[0]

    la = src_local[dtcc["src_a"]]
    lb = src_local[dtcc["src_b"]]
    ls = sta_local[dtcc["sta"]]
    ok = (la >= 0) & (lb >= 0) & (ls >= 0)
    idx = np.where(ok)[0][:n_dt]
    fill = _empty_dtcc(n_dt)
    n = len(idx)
    for name, src in (("dt_a", la), ("dt_b", lb), ("dt_sta", ls),
                      ("dt_ph", dtcc["ph"]), ("dt_w", dtcc["w"]),
                      ("dt_t", dtcc["dt"])):
        arr = np.asarray(fill[name]).copy()
        if n:
            arr = np.zeros(n_dt, arr.dtype)
            arr[:n] = src[idx]
        fill[name] = jnp.asarray(arr)
    m = np.zeros(n_dt, bool)
    m[:n] = True
    fill["dt_mask"] = jnp.asarray(m)
    return graph._replace(**fill)


class _Seq2(nn.Module):
    """Linear → PReLU → Linear (the reference's nn.Sequential blocks)."""

    n_hidden: int
    n_out: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.n_out)(PReLU()(nn.Dense(self.n_hidden)(x)))


class _DDConv(nn.Module):
    """One GraphDD DataAggregation round (ref train_double_difference_model.
    py:333-388): dual-relation mean conv on the (source × station) product
    where every message passes through a shared ``merge_edges`` Linear+PReLU
    carrying the sender−receiver relative position (station offsets for the
    same-source relation, source offsets for the same-station relation), and
    the embedded input mask is concatenated at every linear (``n_dim_mask =
    n_embed``). Messages from unobserved product cells are excluded from the
    means — the reference's subgraph product contains only observed pairs.

    Dense layout note: ``merge_edges(cat(x_j, e))`` is split as
    ``Dense(x_j) + Dense_nobias(e)`` (one linear, algebraically identical),
    so the edge term is computed once per (receiver, k) and broadcast over
    the other product axis instead of materializing the concatenation."""

    n_hidden: int = 30
    out_channels: int = 15

    @nn.compact
    def __call__(self, x, m, sta_nbr, src_nbr, e_sta, e_src, send_mask):
        # x: (S, n_sta, C); m: (S, n_sta, n_embed); send_mask: (S, n_sta)
        # e_sta: (n_sta, k_sta, 3); e_src: (S, k_src, 3) — scaled offsets
        h = self.n_hidden
        act = PReLU()
        a11, a12, a1 = PReLU(), PReLU(), PReLU()
        a21, a22, a2 = PReLU(), PReLU(), PReLU()
        me_x = nn.Dense(h, name="merge_edges_x")
        me_e = nn.Dense(h, use_bias=False, name="merge_edges_e")
        me_act = PReLU()
        fe_sta = me_e(e_sta)                       # (n_sta, k_sta, h)
        fe_src = me_e(e_src)                       # (S, k_src, h)
        v_sta = send_mask[:, sta_nbr]              # (S, n_sta, k_sta)
        v_src = send_mask[src_nbr]                 # (S, k_src, n_sta)

        def agg_sta(v):
            msg = me_act(me_x(v)[:, sta_nbr] + fe_sta[None])    # (S, n_sta, k, h)
            msg = msg * v_sta[..., None]
            return msg.sum(2) / jnp.maximum(v_sta.sum(2), 1.0)[..., None]

        def agg_src(v):
            msg = me_act(me_x(v)[src_nbr] + fe_src[:, :, None])  # (S, k, n_sta, h)
            msg = msg * v_src[..., None]
            return msg.sum(1) / jnp.maximum(v_src.sum(1), 1.0)[..., None]

        tr = act(nn.Dense(h, name="init_trns")(jnp.concatenate((x, m), -1)))
        # round 1: the reference feeds act(tr) straight into propagate
        # (l1_*_1 linears exist but are unused — behaviour preserved)
        tr1 = nn.Dense(h, name="l1_t1_2")(jnp.concatenate((tr, agg_sta(a11(tr)), m), -1))
        tr2 = nn.Dense(h, name="l1_t2_2")(jnp.concatenate((tr, agg_src(a12(tr)), m), -1))
        tr = a1(jnp.concatenate((tr1, tr2), -1))
        tr1 = nn.Dense(self.out_channels, name="l2_t1_2")(jnp.concatenate(
            (tr, agg_sta(a21(nn.Dense(h, name="l2_t1_1")(tr))), m), -1))
        tr2 = nn.Dense(self.out_channels, name="l2_t2_2")(jnp.concatenate(
            (tr, agg_src(a22(nn.Dense(h, name="l2_t2_1")(tr))), m), -1))
        return a2(jnp.concatenate((tr1, tr2), -1))


class _DDReadOut(nn.Module):
    """Gated bipartite readout (ref BipartiteGraphOperator(,Sta) :390-436):
    per product cell, message = PReLU(fc1(cat(x, mask_embed, rel_pos/scale)))
    with fc1 = Linear→PReLU→Linear, masked MEAN over one product axis
    (only observed cells exist in the reference's subgraph), then
    PReLU(fc2(·))."""

    axis: int                 # 1 = collapse stations (per-source), 0 = per-station
    n_out: int = 15
    scale_rel: float = 30e3

    @nn.compact
    def __call__(self, x, m, rel, prod_mask):
        a1, a2 = PReLU(), PReLU()
        inner = x.shape[-1]
        msg = a1(_Seq2(inner, inner, name="fc1")(
            jnp.concatenate((x, m, rel / self.scale_rel), -1)))
        msg = msg * prod_mask
        agg = msg.sum(self.axis) / jnp.maximum(prod_mask.sum(self.axis), 1.0)
        return a2(nn.Dense(self.n_out, name="fc2")(agg))


class GNNLocation(nn.Module):
    """Relocation GNN (ref GNN_Location :438-538): embed the input features
    into an n_embed mask channel concatenated at every conv linear, run
    ``n_rounds`` edge-featured dual-relation conv rounds over the product,
    read out per-source and per-station embeddings with gated bipartite
    means, then heads: Δx = pos_scale·proj(x1) (reference form — no tanh),
    Δt = proj_t(x1), per-station P/S statics = proj_c(x2). ``memory``
    (EMA of previous predictions, ref :488-505) merges into x1 via
    proj_memory/merge_data."""

    n_hidden: int = 30
    n_embed: int = 10
    n_embed_hidden: int = 20
    pos_scale: float = 5e3
    n_rounds: int = 5
    scale_rel_conv: float = 30.0   # applied to /1000 positions (ref :369-371)
    scale_rel_read: float = 30e3

    @nn.compact
    def __call__(self, feat, src_nbr, sta_nbr, prod_mask, src_pos, sta_pos,
                 memory=None):
        # feat: (S, n_sta, C); prod_mask: (S, n_sta, 1)
        m = _Seq2(self.n_embed_hidden, self.n_embed, name="embed_inpt")(feat)
        e_sta = (sta_pos[sta_nbr] - sta_pos[:, None]) / 1000.0 / self.scale_rel_conv
        e_src = (src_pos[src_nbr] - src_pos[:, None]) / 1000.0 / self.scale_rel_conv
        send = prod_mask[..., 0]
        x = feat
        for _ in range(self.n_rounds):
            x = _DDConv(self.n_hidden)(x, m, sta_nbr, src_nbr, e_sta, e_src, send)
        rel = src_pos[:, None, :] - sta_pos[None, :, :]        # (S, n_sta, 3)
        x1 = _DDReadOut(axis=1, scale_rel=self.scale_rel_read,
                        name="read_src")(x, m, rel, prod_mask)
        x2 = _DDReadOut(axis=0, scale_rel=self.scale_rel_read,
                        name="read_sta")(x, m, -rel, prod_mask)
        if memory is not None:
            pm = _Seq2(30, 15, name="proj_memory")(memory)
            x1 = _Seq2(30, 30, name="merge_data")(jnp.concatenate((x1, pm), -1))
        d_pos = self.pos_scale * _Seq2(30, 3, name="proj")(x1)
        d_t = _Seq2(15, 1, name="proj_t")(x1)[:, 0]
        sta_corr = _Seq2(15, 2, name="proj_c")(x2)
        return d_pos, d_t, sta_corr


def make_feature_tensor(graph: RelocGraph, sta_cart, resid, partials,
                        scale_t: float = 5.0, scale_x: float = 50e3,
                        memory=None):
    """15-dim per-(source, station) inputs (ref :766-789); ``memory``
    optionally appends the EMA of previous predictions (Δx/Δt per source,
    the reference's buffer_weight=0.98 memory input, ref :793-820).
    ``sta_cart`` here is the graph's station subset (see ``sta_sel``)."""
    off = (graph.src_pos[:, None, :] - sta_cart[None, :, :]) / scale_x
    off_n = jnp.linalg.norm(off, axis=-1, keepdims=True)
    pick_cnt = graph.obs_mask.sum(axis=(1, 2))
    log_cnt = jnp.log1p(pick_cnt)[:, None, None] * jnp.ones_like(off_n)
    p_scaled = partials * (1.0 / 60.0) * jnp.asarray([1.0, 1.0, 100e3]).reshape(1, 1, 1, 3)
    # normalized absolute source position — the reference's inpt_sources=True
    # append (train_double_difference_model.py:448-450, n_inpt = 15 + 3)
    src_abs = jnp.broadcast_to(graph.src_pos[:, None, :] / scale_x,
                               off.shape)
    parts = [
        resid[:, :, 0:1] / scale_t, resid[:, :, 1:2] / scale_t,
        p_scaled[:, :, 0, :], p_scaled[:, :, 1, :],
        off, off_n, log_cnt,
        graph.obs_mask[:, :, 0:1], graph.obs_mask[:, :, 1:2],
        src_abs,
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
                 w_dtcc: float = 0.8, w_cal: float = 0.5,
                 use_memory: bool = False):
    """Differentiable relocation loss through the travel-time surrogate.
    Loss weights follow the reference (train_double_difference_model.py:
    1040-1050): 0.8 double-difference (+0.8 dt.cc when observations are
    attached), 0.2 split between absolute and station-mean, plus the
    calibration-to-reference loss (:830-854) when matched reference events
    are attached (``attach_reference``)."""

    def loss_fn(params, graph: RelocGraph, memory=None):
        sc = sta_cart[graph.sta_sel]         # graph's observed-station subset
        resid, partials = build_catalog_data(
            trv_from_cart, sc, graph.src_pos, graph.src_time,
            graph.obs_time, graph.obs_mask)
        feat, prod_mask = make_feature_tensor(graph, sc, resid, partials,
                                              memory=memory)
        d_pos, d_t, sta_corr = model.apply(params, feat, graph.src_nbr,
                                           graph.sta_nbr, prod_mask,
                                           graph.src_pos, sc, memory=memory)
        new_pos = graph.src_pos + d_pos * graph.src_mask[:, None]
        new_t = graph.src_time + d_t * graph.src_mask
        t_full = trv_from_cart(sc, new_pos)          # (S, n_sta_g, 2)
        pred = t_full + new_t[:, None, None] + sta_corr[None, :, :]
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

        # optional dt.cc differential-time loss (ref :1010-1035): the model
        # must reproduce the cross-correlation differential times between
        # paired sources at a shared station/phase; S phase down-weighted 0.5
        t_a = (t_full[graph.dt_a, graph.dt_sta, graph.dt_ph] + new_t[graph.dt_a]
               + sta_corr[graph.dt_sta, graph.dt_ph])
        t_b = (t_full[graph.dt_b, graph.dt_sta, graph.dt_ph] + new_t[graph.dt_b]
               + sta_corr[graph.dt_sta, graph.dt_ph])
        wp = jnp.where(graph.dt_ph == 1, 0.5, 1.0) * graph.dt_w * graph.dt_mask
        l_dtcc = ((wp * jnp.abs(graph.dt_t - (t_a - t_b))).sum()
                  / jnp.maximum(wp.sum(), 1e-6))
        total = total + w_dtcc * l_dtcc * (graph.dt_mask.sum() > 0)

        # calibration-to-reference loss (ref :830-854): on matched sources,
        # (a) the relocated travel-time curve must match the curve computed
        # at the reference location/time (station statics cancel in the
        # reference's difference), (b) observed arrivals must fit the
        # reference-location times + station statics (S down-weighted 0.5,
        # ref weight_s_loss)
        l_cal = jnp.float32(0.0)
        if graph.ref_mask is not None:
            t_ref = (trv_from_cart(sc, graph.ref_pos)
                     + graph.ref_time[:, None, None])
            t_new = t_full + new_t[:, None, None]
            mc = m * graph.ref_mask[:, None, None]
            denom = jnp.maximum(mc.sum(), 1.0)
            l_cal_abs = (jnp.abs(t_new - t_ref) * mc).sum() / denom
            wph = jnp.asarray([1.0, 0.5]).reshape(1, 1, 2)
            rc = (graph.obs_time - (t_ref + sta_corr[None, :, :])) * mc
            l_cal_data = (jnp.abs(rc) * wph).sum() / denom
            l_cal = 0.5 * (l_cal_abs + l_cal_data)
            total = total + w_cal * l_cal * (graph.ref_mask.sum() > 0)

        return total, ({"dd": l_dd, "abs": l_abs, "sta": l_sta,
                        "dtcc": l_dtcc, "cal": l_cal},
                       jax.lax.stop_gradient(d_pos), jax.lax.stop_gradient(d_t))

    return loss_fn


def train_graphdd(key, model: GNNLocation, trv_from_cart, sta_cart, graphs,
                  n_steps: int = 500, lr: float = 1e-3,
                  use_memory: bool = False, buffer_weight: float = 0.98):
    """Adam over the relocation graphs (ref: 50k steps; caller scales).
    ``use_memory`` feeds the EMA of previous (Δx, Δt) predictions back as an
    input (ref :793-820); buffers are per graph."""
    g0 = graphs[0]
    sc0 = sta_cart[g0.sta_sel]
    resid, partials = build_catalog_data(trv_from_cart, sc0, g0.src_pos,
                                         g0.src_time, g0.obs_time, g0.obs_mask)
    mem0 = jnp.zeros((g0.src_pos.shape[0], 4)) if use_memory else None
    feat, prod_mask = make_feature_tensor(g0, sc0, resid, partials, memory=mem0)
    params = model.init(key, feat, g0.src_nbr, g0.sta_nbr, prod_mask,
                        g0.src_pos, sc0, memory=mem0)
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
    """Apply the trained model: returns (new_pos, new_t, sta_corr) —
    ``sta_corr`` rows follow ``graph.sta_sel``."""
    sc = sta_cart[graph.sta_sel]
    resid, partials = build_catalog_data(
        trv_from_cart, sc, graph.src_pos, graph.src_time,
        graph.obs_time, graph.obs_mask)
    feat, prod_mask = make_feature_tensor(graph, sc, resid, partials)
    d_pos, d_t, sta_corr = model.apply(params, feat, graph.src_nbr,
                                       graph.sta_nbr, prod_mask,
                                       graph.src_pos, sc)
    return (graph.src_pos + d_pos * graph.src_mask[:, None],
            graph.src_time + d_t * graph.src_mask, sta_corr)
