"""Continuous-window inference pipeline.

TPU-native equivalent of ``process_continuous_days.py`` (ref §2.6): given a
span of real (or synthetic) picks, produce a catalog of located events with
associated picks. Stages:

  1. DETECTION SWEEP — sliding windows; per window: featurize picks on the
     dense product layout (same searchsorted trick as training) and run
     ``forward_detection_only`` on a fixed query grid. Windows are batched
     and scanned on device; overlapping outputs are max-stacked.
  2. PEAKS — per query node, local maxima over time above ``thresh``
     (ref :812-849).
  3. GROUPS + CLUSTERING — split candidates at ≥break_win gaps, LocalMarching
     per group (ref :851-890).
  4. REFINEMENT — per surviving source, dense random re-query around the
     candidate and argmax (ref :917-1005, simplified to one batched query).
  5. ASSOCIATION — full forward at the refined sources → per-pick P/S scores
     (ref :1020-1065).
  6. COMPETITIVE ASSIGNMENT over connected components of the source-pick
     weight graph (ref :1169-1533).
  7. LOCATION + uncertainty per source with residual trimming (ref
     :1576-1960), then min-picks/min-stations quality filter.

The embedded featurization self-check of the reference (:651-697) is
exposed as :func:`self_check_featurization` and run in the test suite.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from genie_tpu.config import Config
from genie_tpu.graphs.build import build_pair_table, build_query_attachment
from genie_tpu.infer.assign import competitive_assignment
from genie_tpu.infer.cluster import (
    connected_components,
    find_peaks_1d,
    local_marching,
    split_time_groups,
)
from genie_tpu.infer.locate import locate_source, location_uncertainty
from genie_tpu.models.detector import Detector, GraphBundle, PickSet, QuerySet
from genie_tpu.synth.generator import featurize_window
from genie_tpu.train.trainer import DomainContext


@dataclass
class CatalogEvent:
    pos_cart: np.ndarray       # (3,)
    time: float                # absolute seconds
    picks: np.ndarray          # indices into the day pick arrays
    pick_phases: np.ndarray    # 0/1 per assigned pick
    cov: np.ndarray | None = None
    mag: float | None = None


def _make_graph(ctx: DomainContext, g: int, sta_mask, sta_nbr, sta_nbr_valid):
    return GraphBundle(
        sta_nbr=sta_nbr, sta_nbr_valid=sta_nbr_valid, src_nbr=ctx.src_nbr[g],
        sta_mask=sta_mask, edge_feat=ctx.edge_feat[g], src_pos=ctx.grids_cart[g],
        time_ptr_p=ctx.time_ptr_p[g], time_ptr_s=ctx.time_ptr_s[g],
        dt0=jnp.float32(ctx.dt0), dt=jnp.float32(ctx.dt), trv=ctx.trv_grids[g],
    )


class InferencePipeline:
    """Stateful wrapper holding the model, domain, and compiled kernels."""

    def __init__(self, model: Detector, params, cfg: Config, ctx: DomainContext,
                 trv_from_cart: Callable, x_query_grid=None, n_t: int = 9):
        self.model = model
        self.params = params
        self.cfg = cfg
        self.ctx = ctx
        self.trv = trv_from_cart
        self.n_t = n_t
        n_sta = ctx.sta_cart.shape[0]
        self.sta_mask = jnp.ones(n_sta, bool)
        from genie_tpu.graphs.build import build_station_graph
        self.sta_nbr, self.sta_nbr_valid = build_station_graph(
            ctx.sta_cart, cfg.graph.k_sta_edges, self.sta_mask)
        # fixed detection query grid (defaults to grid 0 nodes; the reference
        # kmeans-packs n_query_grid fresh nodes, :436-462)
        self.x_query = (jnp.asarray(x_query_grid) if x_query_grid is not None
                        else ctx.grids_cart[0])
        self.t_query = jnp.linspace(-cfg.model.t_win / 2, cfg.model.t_win / 2, n_t)[:, None]
        self._xq_idx = [build_query_attachment(ctx.grids_cart[g], self.x_query,
                                               k=cfg.graph.k_spatial_attn)
                        for g in range(ctx.grids_cart.shape[0])]
        self._sweep_fn = jax.jit(self._sweep_window, static_argnames=("grid",))
        self._sweep_batch_fn = jax.jit(
            jax.vmap(self._sweep_window, in_axes=(0, 0, 0, 0, None)),
            static_argnums=(4,))
        self._assoc_fn = jax.jit(self._assoc_window, static_argnames=("grid",))

    # -- stage 1: detection sweep -----------------------------------------
    def _sweep_window(self, tpick, ipick, phase, pick_mask, grid: int):
        feat, fmask = featurize_window(
            tpick, ipick, phase, pick_mask, self.ctx.trv_grids[grid],
            self.cfg.train.src_t_kernel, self.sta_mask)
        graph = _make_graph(self.ctx, grid, self.sta_mask, self.sta_nbr,
                            self.sta_nbr_valid)
        y, x = self.model.apply(
            self.params, feat, fmask, graph, self.ctx.sta_cart,
            self.x_query, self._xq_idx[grid], self.t_query,
            method=Detector.forward_detection_only)
        return x[:, :, 0]  # (n_query, n_t)

    def _window_picks(self, pick_t, pick_sta, pick_phase, t0):
        """Pad/slice the day pick arrays to one window (host side)."""
        cfg = self.cfg
        max_t = float(np.max(np.asarray(self.ctx.trv_grids)))
        n_pick = cfg.graph.max_picks
        rel = pick_t - t0
        sel = np.where((rel > -10.0) & (rel < cfg.model.t_win + max_t + 10.0))[0]
        sel = sel[:n_pick]
        tp = np.zeros(n_pick, np.float32)
        ip = np.zeros(n_pick, np.int32)
        ph = np.zeros((n_pick, 1), np.float32)
        pm = np.zeros(n_pick, bool)
        tp[:len(sel)] = rel[sel]
        ip[:len(sel)] = pick_sta[sel]
        ph[:len(sel), 0] = pick_phase[sel]
        pm[:len(sel)] = True
        return tp, ip, ph, pm, sel

    def detection_sweep(self, pick_t, pick_sta, pick_phase, t_start, t_end,
                        grid: int = 0, window_batch: int = 16):
        """Slide over [t_start, t_end); returns (times, values (n_win, n_q, n_t)).
        Windows are batched ``window_batch`` at a time through one vmapped
        device call (the per-day hot loop, ref :761-810)."""
        cfg = self.cfg
        step = cfg.model.t_win / cfg.process.step_size
        t0s = np.arange(t_start, t_end, step)
        n_q = self.x_query.shape[0]
        outs = np.zeros((len(t0s), n_q, self.n_t), np.float32)
        # host-side pick windowing for all windows first
        batch_idx, batch_data = [], []
        for w, t0 in enumerate(t0s):
            tp, ip, ph, pm, _ = self._window_picks(pick_t, pick_sta, pick_phase, t0)
            if pm.sum() == 0:
                continue  # quiescent skip (ref :725-754)
            batch_idx.append(w)
            batch_data.append((tp, ip, ph, pm))
        for s in range(0, len(batch_idx), window_batch):
            chunk = batch_data[s:s + window_batch]
            pad = window_batch - len(chunk)
            if pad:
                chunk = chunk + [chunk[-1]] * pad
            tp = jnp.asarray(np.stack([c[0] for c in chunk]))
            ip = jnp.asarray(np.stack([c[1] for c in chunk]))
            ph = jnp.asarray(np.stack([c[2] for c in chunk]))
            pm = jnp.asarray(np.stack([c[3] for c in chunk]))
            out = np.asarray(self._sweep_batch_fn(tp, ip, ph, pm, grid))
            for j, w in enumerate(batch_idx[s:s + window_batch]):
                outs[w] = out[j]
        return t0s, outs

    # -- stages 2-4: candidates -------------------------------------------
    def extract_candidates(self, t0s, sweep_vals, thresh=None):
        """Overlap-stack the sweep onto a regular time axis (the reference's
        overlap stacking, :802-810: overlapping window estimates of the same
        absolute time are averaged), then peak-find per query node."""
        cfg = self.cfg
        thresh = cfg.process.thresh if thresh is None else thresh
        n_win, n_q, n_t = sweep_vals.shape
        t_rel = np.linspace(-cfg.model.t_win / 2, cfg.model.t_win / 2, n_t)
        dt_axis = t_rel[1] - t_rel[0] if n_t > 1 else 1.0
        t_abs = (t0s[:, None] + t_rel[None, :])            # (n_win, n_t)
        t_min = t_abs.min()
        bins = np.round((t_abs - t_min) / dt_axis).astype(np.int64)
        n_bins = bins.max() + 1
        acc = np.zeros((n_q, n_bins), np.float32)
        cnt = np.zeros(n_bins, np.float32)
        flat_bins = bins.reshape(-1)
        np.add.at(cnt, flat_bins, 1.0)
        vals = sweep_vals.transpose(1, 0, 2).reshape(n_q, -1)  # (n_q, n_win*n_t)
        for q in range(n_q):
            np.add.at(acc[q], flat_bins, vals[q])
        series = acc / np.maximum(cnt, 1.0)[None, :]
        times_s = t_min + dt_axis * np.arange(n_bins)
        cands = []
        spacing = max(1, int(1.5 * cfg.train.src_t_kernel / max(dt_axis, 1e-6)))
        xq = np.asarray(self.x_query)
        for q in range(n_q):
            idx = find_peaks_1d(series[q], thresh, min_spacing=spacing)
            for i in idx:
                cands.append((xq[q, 0], xq[q, 1], xq[q, 2], times_s[i], series[q, i]))
        if not cands:
            return np.zeros((0, 4)), np.zeros(0)
        cands = np.array(cands)
        return cands[:, :4], cands[:, 4]

    def cluster_candidates(self, cands, vals):
        cfg = self.cfg
        if len(cands) == 0:
            return np.zeros((0, 4)), np.zeros(0)
        groups = split_time_groups(cands[:, 3], cfg.process.break_win)
        kept_pos, kept_val = [], []
        for g in groups:
            keep = local_marching(cands[g], vals[g], tc_win=cfg.process.tc_win,
                                  sp_win=cfg.process.sp_win)
            kept_pos.append(cands[g][keep])
            kept_val.append(vals[g][keep])
        return np.concatenate(kept_pos), np.concatenate(kept_val)

    # -- stage 4: refinement ------------------------------------------------
    def refine_sources(self, pick_t, pick_sta, pick_phase, srcs, vals,
                       grid: int = 0, n_rand: int = 1024, key=None):
        """Per-source local relocation by dense random re-querying around the
        candidate (ref :917-1005, n_rand_query offsets → argmax)."""
        import jax as _jax
        if len(srcs) == 0:
            return srcs, vals
        key = key if key is not None else jax.random.PRNGKey(0)
        cfg = self.cfg
        out = srcs.copy()
        sig = np.array([cfg.process.sp_win, cfg.process.sp_win,
                        0.5 * cfg.process.sp_win], np.float32)
        for i in range(len(srcs)):
            # window start at the candidate time: detection outputs live at
            # t0 + t_rel with t_rel ∈ ±t_win/2 (matching training labels)
            t0 = srcs[i, 3]
            tp, ip, ph, pm, _ = self._window_picks(pick_t, pick_sta, pick_phase, t0)
            if pm.sum() == 0:
                continue
            koff = jax.random.fold_in(key, i)
            offs = np.asarray(jax.random.normal(koff, (n_rand, 3))) * sig
            xq = (srcs[i, :3][None] + offs).astype(np.float32)
            xq[0] = srcs[i, :3]
            xq_idx = build_query_attachment(self.ctx.grids_cart[grid], xq,
                                            k=cfg.graph.k_spatial_attn)
            _, x = self.model.apply(
                self.params, *self._feat_for(tp, ip, ph, pm, grid),
                _make_graph(self.ctx, grid, self.sta_mask, self.sta_nbr,
                            self.sta_nbr_valid), self.ctx.sta_cart,
                jnp.asarray(xq), xq_idx, self.t_query,
                method=Detector.forward_detection_only)
            x = np.asarray(x[:, :, 0])
            qi, ti = np.unravel_index(np.argmax(x), x.shape)
            if x[qi, ti] > vals[i]:
                out[i, :3] = xq[qi]
                t_rel = np.linspace(-cfg.model.t_win / 2, cfg.model.t_win / 2,
                                    x.shape[1])[ti]
                out[i, 3] = t0 + t_rel
                vals[i] = x[qi, ti]
        return out, vals

    def _feat_for(self, tp, ip, ph, pm, grid):
        feat, fmask = featurize_window(
            jnp.asarray(tp), jnp.asarray(ip), jnp.asarray(ph), jnp.asarray(pm),
            self.ctx.trv_grids[grid], self.cfg.train.src_t_kernel, self.sta_mask)
        return feat, fmask

    # -- stage 5: association ---------------------------------------------
    def _assoc_window(self, tpick, ipick, phase, pick_mask, x_qsrc, tq_sample,
                      grid: int):
        cfg = self.cfg
        feat, fmask = featurize_window(
            tpick, ipick, phase, pick_mask, self.ctx.trv_grids[grid],
            cfg.train.src_t_kernel, self.sta_mask)
        graph = _make_graph(self.ctx, grid, self.sta_mask, self.sta_nbr,
                            self.sta_nbr_valid)
        pair_idx, pair_valid = build_pair_table(
            tpick, ipick, pick_mask, k_pair=cfg.graph.k_pick_pairs)
        picks = PickSet(tpick, ipick, phase, pick_mask, pair_idx, pair_valid)
        xqs_idx = build_query_attachment(self.ctx.grids_cart[grid], x_qsrc,
                                         k=cfg.graph.k_spatial_attn)
        queries = QuerySet(
            x_query=x_qsrc, x_query_idx=xqs_idx, t_query=self.t_query,
            x_qsrc=x_qsrc, x_qsrc_idx=xqs_idx, tq_sample=tq_sample,
            trv_qsrc=self.trv(self.ctx.sta_cart, x_qsrc),
        )
        y, x, arv_p, arv_s = self.model.apply(
            self.params, feat, fmask, graph, self.ctx.sta_cart, picks, queries)
        return arv_p[:, :, 0], arv_s[:, :, 0]

    def associate(self, pick_t, pick_sta, pick_phase, srcs, grid: int = 0,
                  n_qsrc_pad: int | None = None):
        """srcs: (n, 4) candidate (x, y, z, t_abs). Returns per-source pick
        assignment via competitive assignment over weight-graph components."""
        cfg = self.cfg
        if len(srcs) == 0:
            return []
        # one association window anchored so query times fall in the trained
        # tq range (~[0, t_win])
        t0 = srcs[:, 3].min() - cfg.model.t_win / 4
        tp, ip, ph, pm, sel = self._window_picks(pick_t, pick_sta, pick_phase, t0)
        n_pad = n_qsrc_pad or max(8, len(srcs))
        xq = np.zeros((n_pad, 3), np.float32)
        tq = np.zeros(n_pad, np.float32)
        xq[:len(srcs)] = srcs[:, :3]
        tq[:len(srcs)] = srcs[:, 3] - t0
        arv_p, arv_s = self._assoc_fn(
            jnp.asarray(tp), jnp.asarray(ip), jnp.asarray(ph), jnp.asarray(pm),
            jnp.asarray(xq), jnp.asarray(tq), grid=grid)
        w = np.stack((np.asarray(arv_p), np.asarray(arv_s)), axis=-1)[:len(srcs)]
        w = np.where(w > cfg.process.thresh_assoc, w, 0.0)  # (n_src, n_pick, 2)
        w = w * pm[None, :, None]

        # connected components of the source-pick graph (ref :1169-1254)
        n_src, n_pick = w.shape[:2]
        has_w = w.sum(-1) > 0
        edges = []
        for q in range(n_src):
            for p in np.where(has_w[q])[0]:
                edges.append((q, n_src + p))
        labels = connected_components(n_src + n_pick, edges)
        results = []
        for lab in np.unique(labels[:n_src]):
            qs = np.where(labels[:n_src] == lab)[0]
            ps = np.where(labels[n_src:] == lab)[0]
            if len(ps) == 0:
                continue
            # oversized components: spectral split (ref :1269-1441)
            if len(qs) > cfg.process.max_sources_per_component:
                from genie_tpu.infer.split import split_component
                parts = split_component(
                    w[np.ix_(qs, ps)], ip[ps], srcs[qs, :3], srcs[qs, 3],
                    cfg.process.max_sources_per_component,
                    max_splits=cfg.process.max_splits)
                parts = [(qs[q_l], ps[p_l]) for q_l, p_l in parts]
            else:
                parts = [(qs, ps)]
            for qs_p, ps_p in parts:
                if len(ps_p) == 0 or len(qs_p) == 0:
                    continue
                sub_w = w[np.ix_(qs_p, ps_p)].transpose(1, 0, 2)
                assign, active = competitive_assignment(
                    sub_w, ip[ps_p], cost=cfg.process.cost_assignment)
                for qi, q in enumerate(qs_p):
                    rows = np.where((assign[:, 0] == qi))[0]
                    if len(rows) == 0:
                        continue
                    pick_rows = ps_p[rows]
                    results.append(CatalogEvent(
                        pos_cart=srcs[q, :3].copy(), time=float(srcs[q, 3]),
                        picks=sel[pick_rows], pick_phases=assign[rows, 1].copy(),
                    ))
        return results

    # -- stage 7: location --------------------------------------------------
    def locate(self, events, pick_t, pick_sta, key=None):
        cfg = self.cfg
        key = key if key is not None else jax.random.PRNGKey(0)
        lo = np.concatenate((np.asarray(self.ctx.offset_cart), [-30.0])).astype(np.float32)
        hi = np.concatenate((np.asarray(self.ctx.offset_cart)
                             + np.asarray(self.ctx.scale_cart), [30.0])).astype(np.float32)
        out = []
        for i, ev in enumerate(events):
            if len(ev.picks) < cfg.process.min_required_picks:
                continue
            if len(np.unique(pick_sta[ev.picks])) < cfg.process.min_required_sta:
                continue
            tp = jnp.asarray((pick_t[ev.picks] - ev.time).astype(np.float32))
            ip = jnp.asarray(pick_sta[ev.picks].astype(np.int32))
            ph = jnp.asarray(ev.pick_phases.astype(np.float32)[:, None])
            mask = jnp.ones(len(ev.picks), bool)
            pos, t0, cost = locate_source(
                jax.random.fold_in(key, i), self.trv, self.ctx.sta_cart,
                tp, ip, ph, mask, lo, hi,
                trim_fraction=cfg.process.trim_fraction)
            cov = location_uncertainty(self.trv, self.ctx.sta_cart, pos, t0,
                                       tp, ip, ph, mask)
            ev.pos_cart = np.asarray(pos)
            ev.time = ev.time + float(t0)
            ev.cov = np.asarray(cov)
            out.append(ev)
        return out

    # -- full day ----------------------------------------------------------
    def process(self, pick_t, pick_sta, pick_phase, t_start, t_end, grid: int = 0):
        t0s, sweep = self.detection_sweep(pick_t, pick_sta, pick_phase,
                                          t_start, t_end, grid=grid)
        cands, vals = self.extract_candidates(t0s, sweep)
        srcs, svals = self.cluster_candidates(cands, vals)
        if len(srcs) == 0:
            return []
        srcs, svals = self.refine_sources(
            pick_t, pick_sta, pick_phase, srcs, svals, grid=grid,
            n_rand=min(1024, self.cfg.process.n_rand_query))
        # association windows are t_win-scale: process candidate sources in
        # disjoint time groups (ref break_win grouping, :851-890), further
        # chunked so each group spans ≤ t_win (the trained query-time range)
        events = []
        for g in split_time_groups(srcs[:, 3], self.cfg.process.break_win):
            g = g[np.argsort(srcs[g, 3])]
            start = 0
            while start < len(g):
                span_end = srcs[g[start], 3] + self.cfg.model.t_win
                sub = g[(srcs[g, 3] >= srcs[g[start], 3])
                        & (srcs[g, 3] <= span_end)]
                events.extend(self.associate(
                    pick_t, pick_sta, pick_phase,
                    np.concatenate((srcs[sub, :3], srcs[sub, 3:4]), axis=1),
                    grid=grid))
                start += len(sub)
        located = self.locate(events, pick_t, pick_sta)
        return self.dedup(located)

    def dedup(self, events):
        """Final duplicate merge — the reference's second LocalMarching pass
        (:1075-1093): among located events close in space-time keep the one
        with the most associated picks."""
        if len(events) <= 1:
            return events
        cands = np.array([[*ev.pos_cart, ev.time] for ev in events])
        vals = np.array([len(ev.picks) for ev in events], float)
        keep = local_marching(cands, vals, tc_win=2 * self.cfg.process.tc_win,
                              sp_win=self.cfg.process.sp_win)
        return [events[i] for i in keep]


def self_check_featurization(ctx: DomainContext, trv_from_cart, kernel_sig_t,
                             grid: int = 0, n_test: int = 5, seed: int = 0):
    """The reference's embedded integration test (:651-697): fabricate picks
    from known grid sources, assert the featurizer scores > 0.9 at the true
    (source, station) cells and < 0.1 at random offsets."""
    rng = np.random.default_rng(seed)
    n_src, n_sta = ctx.trv_grids.shape[1:3]
    src_ids = rng.choice(n_src, n_test, replace=False)
    trv = np.asarray(ctx.trv_grids[grid])
    tp, ip, ph = [], [], []
    for s in src_ids:
        for st in range(n_sta):
            tp.append(trv[s, st, 0]); ip.append(st); ph.append(0)
            tp.append(trv[s, st, 1]); ip.append(st); ph.append(1)
    # all events at window-relative origin time 0 — but that stacks n_test
    # sources at once; instead check each source in its own window
    ok_hit, ok_miss = True, True
    for s in src_ids:
        tp = np.concatenate((trv[s, :, 0], trv[s, :, 1])).astype(np.float32)
        ip = np.concatenate((np.arange(n_sta), np.arange(n_sta))).astype(np.int32)
        ph = np.concatenate((np.zeros(n_sta), np.ones(n_sta))).astype(np.float32)[:, None]
        pm = np.ones(2 * n_sta, bool)
        feat, _ = featurize_window(
            jnp.asarray(tp), jnp.asarray(ip), jnp.asarray(ph), jnp.asarray(pm),
            ctx.trv_grids[grid], kernel_sig_t, jnp.ones(n_sta, bool))
        f = np.asarray(feat)
        ok_hit &= bool((f[s, :, 0] > 0.9).all() and (f[s, :, 1] > 0.9).all())
        far = (s + n_src // 2) % n_src
        d = np.abs(trv[far] - trv[s]).min()
        if d > 4 * kernel_sig_t:  # only meaningful if times truly differ
            ok_miss &= bool(f[far, :, 2].mean() < 0.5)
    return ok_hit, ok_miss
