"""Training loop: on-device synthetic data → batched forward → Adam.

Replaces the reference driver (train_GENIE_model.py:1382-1881):
  * gradient accumulation over a python loop of 15 samples becomes one
    vmapped forward over the window axis (same objective, truly batched);
  * loss = weighted masked MSE on the 4 outputs (grid detection, query
    detection, P associations, S associations), weights [0.1,0.4,0.25,0.25]
    (ref :1789,1843-1861), each term normalized by its valid-element count;
  * checkpointing via orbax carries params, opt state, and the full config
    snapshot (the reference's snapshot-in-checkpoint contract, :1580-1583);
  * multi-chip: the window axis is sharded over the mesh ``batch`` axis via
    ``genie_tpu.parallel`` (data parallel); gradients are psum-reduced by
    jit under sharding constraints automatically.
"""

from __future__ import annotations


from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from genie_tpu.config import Config
from genie_tpu.graphs.build import (
    build_edge_feat,
    build_pair_table,
    build_query_attachment,
    build_source_graph,
    build_time_pointers,
)
from genie_tpu.models.detector import Detector, GraphBundle, PickSet, QuerySet
from genie_tpu.synth.generator import WindowBatch, make_windows, synthesize_timeline


class DomainContext(NamedTuple):
    """Static per-project arrays shared by training and inference."""

    sta_cart: jnp.ndarray      # (n_sta, 3)
    sta_lla: jnp.ndarray       # (n_sta, 3)
    grids_cart: jnp.ndarray    # (n_grids, n_src, 3)
    grids_lla: jnp.ndarray     # (n_grids, n_src, 3)
    trv_grids: jnp.ndarray     # (n_grids, n_src, n_sta, 2)
    time_ptr_p: jnp.ndarray    # (n_grids, n_sta, n_dt, k_time)
    time_ptr_s: jnp.ndarray
    dt0: float
    dt: float
    edge_feat: jnp.ndarray     # (n_grids, n_src, n_sta, 3)
    src_nbr: jnp.ndarray       # (n_grids, n_src, k_spc)
    scale_cart: jnp.ndarray    # (3,) cart sampling box scale
    offset_cart: jnp.ndarray   # (3,) cart sampling box offset
    # observed per-day station sets (n_subnet, n_sta) bool, or None: sampled
    # as training subsets with prob 1/2 (ref fixed_subnetworks, :910-935)
    subnetworks: Any = None
    # rasterized topography (elev (nx,ny), lo (2,), h (2,)), or None —
    # clamps synthetic event depths (ref train_GENIE_model.py:581-584)
    surface: Any = None
    # (n_ref, 3) reference-catalog cart positions for density sampling
    # (ref :551-557), or None
    ref_srcs_cart: Any = None
    # (n_sta, n_sta) Cholesky factor of the station-distance covariance for
    # correlated travel-time noise (ref :331-481), or None
    corr_chol: Any = None


def _corr_chol(cfg: Config, sta_cart):
    """Cholesky factor of the squared-exponential station-distance
    covariance (ref train_GENIE_model.py:366-376)."""
    d = np.linalg.norm(np.asarray(sta_cart, np.float64)[:, None]
                       - np.asarray(sta_cart, np.float64)[None], axis=-1)
    ell = float(cfg.synth.corr_noise_params[4])
    cov = np.exp(-0.5 * (d / ell) ** 2) + 1e-6 * np.eye(len(d))
    return jnp.asarray(np.linalg.cholesky(cov), jnp.float32)


def build_domain_context(cfg: Config, sta_lla, sta_cart, grids_lla, grids_cart,
                         trv_grids, subnetworks=None, surface=None,
                         ref_srcs_cart=None) -> DomainContext:
    """Precompute grid-dependent tables (kNN graphs, time pointers, bipartite
    edge features) once per project."""
    n_grids = grids_cart.shape[0]
    max_t = float(np.max(np.asarray(trv_grids)))
    ptr_p, ptr_s, src_nbrs, efeats = [], [], [], []
    dt0 = dt = None
    scale, offset = cfg.region.scale_offset(extend=True)
    for g in range(n_grids):
        p, s, dt0, dt, _ = build_time_pointers(
            trv_grids[g], dt=1.0, k=cfg.graph.k_time_edges,
            win=cfg.model.t_win, max_t=max_t)
        ptr_p.append(p)
        ptr_s.append(s)
        src_nbrs.append(build_source_graph(grids_cart[g], cfg.graph.k_spc_edges))
        efeats.append(build_edge_feat(grids_lla[g], sta_lla, scale))

    cart_min = np.asarray(grids_cart).reshape(-1, 3).min(axis=0)
    cart_max = np.asarray(grids_cart).reshape(-1, 3).max(axis=0)
    return DomainContext(
        sta_cart=jnp.asarray(sta_cart), sta_lla=jnp.asarray(sta_lla),
        grids_cart=jnp.asarray(grids_cart), grids_lla=jnp.asarray(grids_lla),
        trv_grids=jnp.asarray(trv_grids),
        time_ptr_p=jnp.stack(ptr_p), time_ptr_s=jnp.stack(ptr_s),
        dt0=dt0, dt=dt, edge_feat=jnp.stack(efeats), src_nbr=jnp.stack(src_nbrs),
        scale_cart=jnp.asarray(cart_max - cart_min, jnp.float32),
        offset_cart=jnp.asarray(cart_min, jnp.float32),
        subnetworks=(None if subnetworks is None
                     else jnp.asarray(subnetworks, bool)),
        surface=(None if surface is None
                 else tuple(jnp.asarray(a, jnp.float32) for a in surface)),
        ref_srcs_cart=(None if ref_srcs_cart is None
                       else jnp.asarray(ref_srcs_cart, jnp.float32)),
        corr_chol=(_corr_chol(cfg, sta_cart)
                   if cfg.synth.use_correlated_noise else None),
    )


def window_forward(model: Detector, params, ctx: DomainContext, cfg: Config,
                   wb_i, trv_from_cart):
    """Forward one window given its WindowBatch slice (no leading axis)."""
    g = wb_i.grid_idx
    graph = GraphBundle(
        sta_nbr=wb_i.sta_nbr, sta_nbr_valid=wb_i.sta_nbr_valid,
        src_nbr=ctx.src_nbr[g], sta_mask=wb_i.sta_mask,
        edge_feat=ctx.edge_feat[g], src_pos=ctx.grids_cart[g],
        time_ptr_p=ctx.time_ptr_p[g], time_ptr_s=ctx.time_ptr_s[g],
        dt0=jnp.float32(ctx.dt0), dt=jnp.float32(ctx.dt),
        trv=ctx.trv_grids[g],
    )
    pair_idx, pair_valid = build_pair_table(
        wb_i.tpick, wb_i.ipick, wb_i.pick_mask, k_pair=cfg.graph.k_pick_pairs)
    picks = PickSet(tpick=wb_i.tpick, ipick=wb_i.ipick, phase=wb_i.phase,
                    mask=wb_i.pick_mask, pair_idx=pair_idx, pair_valid=pair_valid)
    xq_idx = build_query_attachment(ctx.grids_cart[g], wb_i.x_query,
                                    k=cfg.graph.k_spatial_attn)
    xqs_idx = build_query_attachment(ctx.grids_cart[g], wb_i.x_qsrc,
                                     k=cfg.graph.k_spatial_attn)
    n_t = wb_i.lbl_grid.shape[-1]
    t_query = jnp.linspace(-cfg.model.t_win / 2, cfg.model.t_win / 2, n_t)[:, None]
    trv_qsrc = trv_from_cart(ctx.sta_cart, wb_i.x_qsrc)
    queries = QuerySet(
        x_query=wb_i.x_query, x_query_idx=xq_idx, t_query=t_query,
        x_qsrc=wb_i.x_qsrc, x_qsrc_idx=xqs_idx, tq_sample=wb_i.tq_sample,
        trv_qsrc=trv_qsrc,
    )
    return model.apply(params, wb_i.feat, wb_i.mask, graph, ctx.sta_cart,
                       picks, queries)


def loss_fn(model: Detector, params, ctx: DomainContext, cfg: Config,
            wb: WindowBatch, trv_from_cart):
    """Weighted masked MSE over the 4 outputs, vmapped over windows."""
    def one(wb_i):
        y, x, arv_p, arv_s = window_forward(model, params, ctx, cfg, wb_i, trv_from_cart)
        # Optional positive-cell up-weighting: at large grids the Gaussian
        # label bumps cover ~10 of 10^4+ cells and plain-mean MSE gives the
        # detection heads ~100x smaller gradients than the association heads
        # (measured; see RESULTS.md). boost b reweights cell i by
        # (1 + b·lbl_i), normalized — b=0 reproduces the reference loss.
        b = cfg.train.positive_boost

        def wmse(pred, lbl):
            w_cell = 1.0 + b * lbl
            return ((pred - lbl) ** 2 * w_cell).sum() / w_cell.sum()

        l_grid = wmse(y[:, :, 0], wb_i.lbl_grid)
        l_query = wmse(x[:, :, 0], wb_i.lbl_query)
        pm = wb_i.pick_mask[None, :]
        denom = jnp.maximum(pm.sum() * arv_p.shape[0], 1)
        l_p = (((arv_p[:, :, 0] - wb_i.lbl_assoc[:, :, 0]) ** 2) * pm).sum() / denom
        l_s = (((arv_s[:, :, 0] - wb_i.lbl_assoc[:, :, 1]) ** 2) * pm).sum() / denom
        # "trgts/preds" training-health diagnostics (ref Code/README.md:35,
        # train_GENIE_model.py:1874-1881): sums of per-output label/pred maxima
        trgts = jnp.stack((wb_i.lbl_grid.max(), wb_i.lbl_query.max(),
                           wb_i.lbl_assoc[:, :, 0].max(), wb_i.lbl_assoc[:, :, 1].max()))
        preds = jnp.stack((y.max(), x.max(), arv_p.max(), arv_s.max()))

        # optional sensitivity regularizer (ref train_GENIE_model.py:
        # 1792-1829): Gauss-Newton location covariance with the association
        # scores as pick weights and travel-time partials (detached) as the
        # Jacobian; penalizing predicted location uncertainty rewards
        # associations that geometrically constrain the source. Tikhonov
        # damping replaces the reference's condition-number gate.
        l_sens = jnp.float32(0.0)
        if cfg.train.sensitivity_weight > 0:
            def t_of_x(xs):
                return trv_from_cart(ctx.sta_cart, xs[None])[0]  # (n_sta, 2)

            part = jax.lax.stop_gradient(
                jax.vmap(jax.jacfwd(t_of_x))(wb_i.x_qsrc))  # (n_q, n_sta, 2, 3)
            pm_col = wb_i.pick_mask[None, :, None]
            jp = jnp.clip(arv_p[:, :, 0], 0.0)[..., None] * part[:, wb_i.ipick, 0, :] * pm_col
            js = jnp.clip(arv_s[:, :, 0], 0.0)[..., None] * part[:, wb_i.ipick, 1, :] * pm_col
            J = jnp.concatenate((jp, js), axis=1)           # (n_q, 2*n_pick, 3)
            sig_d = cfg.train.sensitivity_sig_d
            G = jnp.einsum("qpi,qpj->qij", J, J) / sig_d**2
            tr = jnp.trace(G, axis1=1, axis2=2)
            eps = 1e-6 * (tr / 3.0 + 1.0)
            cov = jnp.linalg.inv(G + eps[:, None, None] * jnp.eye(3))
            sigma = jnp.sqrt(jnp.clip(
                jnp.diagonal(cov, axis1=1, axis2=2), 0.0).sum(-1))
            ok = (tr > 1e-8).astype(sigma.dtype)            # rows with signal
            l_sens = ((sigma / 1e4) ** 2 * ok).sum() / jnp.maximum(ok.sum(), 1)
        return jnp.stack((l_grid, l_query, l_p, l_s)), trgts, preds, l_sens

    if cfg.train.sequential_windows:
        # scan + remat over windows: activation memory of ONE window instead
        # of n_batch (the reference's gradient-accumulation memory profile;
        # jax.checkpoint recomputes the forward during backward)
        losses, trgts, preds, l_sens = jax.lax.map(jax.checkpoint(one), wb)
    else:
        losses, trgts, preds, l_sens = jax.vmap(one)(wb)
    losses = losses.mean(axis=0)
    w = jnp.asarray(cfg.train.loss_weights)
    total = (w * losses).sum() + cfg.train.sensitivity_weight * l_sens.mean()
    return total, (losses, trgts.sum(axis=0), preds.sum(axis=0))


def make_generate_batch(cfg: Config, ctx: DomainContext, trv_from_cart):
    """Jitted batch generator (for standalone use; inside train_step the
    call is already under jit). Eager use would dispatch hundreds of small
    ops — painful on remote/tunneled backends."""
    return jax.jit(lambda key: generate_batch(key, cfg, ctx, trv_from_cart))


def generate_batch(key, cfg: Config, ctx: DomainContext, trv_from_cart) -> WindowBatch:
    k1, k2 = jax.random.split(key)
    n_sta = ctx.sta_cart.shape[0]
    tl = synthesize_timeline(
        k1, cfg.synth, ctx.sta_cart, trv_from_cart,
        ctx.scale_cart, ctx.offset_cart,
        (ctx.offset_cart[2], ctx.offset_cart[2] + ctx.scale_cart[2]),
        n_sta_real=n_sta, surface=ctx.surface,
        ref_srcs_cart=ctx.ref_srcs_cart, corr_chol=ctx.corr_chol,
    )
    return make_windows(
        k2, cfg.synth, cfg.train, cfg.graph, tl, ctx.sta_cart,
        ctx.grids_cart, ctx.trv_grids, ctx.scale_cart, ctx.offset_cart,
        t_win=cfg.model.t_win, subnetworks=ctx.subnetworks,
    )


def build_training_dataset(cfg: Config, ctx: DomainContext, trv_from_cart,
                           out_dir, n_batches: int, seed: int = 0,
                           job: int = 0, n_jobs: int = 1):
    """Pre-materialize training batches to disk — the reference's
    ``build_training_data`` job-array mode (train_GENIE_model.py:1411-1504;
    each job writes its index stripe, the filesystem is the fabric). Batches
    are one npz per WindowBatch, published atomically (temp + os.replace)
    so a killed job never leaves a truncated file the loader would trust.
    On-device generation is faster on TPU (the default path); this mode
    exists for capability parity and for fixed-dataset reproducibility."""
    import os

    from pathlib import Path

    gen = make_generate_batch(cfg, ctx, trv_from_cart)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    key = jax.random.PRNGKey(seed)
    written = []
    for i in range(job, n_batches, n_jobs):
        path = out_dir / f"training_batch_{i}.npz"
        if path.exists():           # idempotent restart (atomic publish)
            written.append(path)
            continue
        wb = gen(jax.random.fold_in(key, i))
        # tmp keeps the .npz suffix (np.savez appends it otherwise)
        tmp = path.with_name(".tmp_" + path.name)
        np.savez_compressed(tmp, **{f: np.asarray(getattr(wb, f))
                                    for f in wb._fields})
        os.replace(tmp, path)
        written.append(path)
    return written


def load_training_batch(path) -> WindowBatch:
    z = np.load(path)
    return WindowBatch(**{f: jnp.asarray(z[f]) for f in WindowBatch._fields})


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_train_step(model: Detector, cfg: Config, ctx: DomainContext,
                    trv_from_cart, optimizer=None):
    if optimizer is None:
        optimizer = optax.adam(cfg.train.lr)

    @jax.jit
    def train_step(state: TrainState, key):
        wb = generate_batch(key, cfg, ctx, trv_from_cart)

        def loss(p):
            return loss_fn(model, p, ctx, cfg, wb, trv_from_cart)

        (total, (parts, trgts, preds)), grads = jax.value_and_grad(
            loss, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": total, "loss_grid": parts[0], "loss_query": parts[1],
                   "loss_p": parts[2], "loss_s": parts[3],
                   "trgts": trgts, "preds": preds}
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step, optimizer


def make_train_step_from_batch(model: Detector, cfg: Config, ctx: DomainContext,
                               trv_from_cart, optimizer=None):
    """Train step consuming a pre-built WindowBatch (the dataset mode twin
    of :func:`make_train_step`; batches from :func:`build_training_dataset`
    / :func:`load_training_batch`)."""
    if optimizer is None:
        optimizer = optax.adam(cfg.train.lr)

    @jax.jit
    def train_step(state: TrainState, wb: WindowBatch):
        def loss(p):
            return loss_fn(model, p, ctx, cfg, wb, trv_from_cart)

        (total, (parts, trgts, preds)), grads = jax.value_and_grad(
            loss, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": total, "loss_grid": parts[0], "loss_query": parts[1],
                   "loss_p": parts[2], "loss_s": parts[3],
                   "trgts": trgts, "preds": preds}
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step, optimizer


def init_train_state(model: Detector, cfg: Config, ctx: DomainContext,
                     trv_from_cart, key, optimizer=None):
    if optimizer is None:
        optimizer = optax.adam(cfg.train.lr)
    kd, ki = jax.random.split(key)
    wb = make_generate_batch(cfg, ctx, trv_from_cart)(kd)
    wb0 = jax.tree.map(lambda a: a[0], wb)
    g = wb0.grid_idx
    graph = GraphBundle(
        sta_nbr=wb0.sta_nbr, sta_nbr_valid=wb0.sta_nbr_valid,
        src_nbr=ctx.src_nbr[g], sta_mask=wb0.sta_mask,
        edge_feat=ctx.edge_feat[g], src_pos=ctx.grids_cart[g],
        time_ptr_p=ctx.time_ptr_p[g], time_ptr_s=ctx.time_ptr_s[g],
        dt0=jnp.float32(ctx.dt0), dt=jnp.float32(ctx.dt), trv=ctx.trv_grids[g],
    )
    pair_idx, pair_valid = build_pair_table(
        wb0.tpick, wb0.ipick, wb0.pick_mask, k_pair=cfg.graph.k_pick_pairs)
    picks = PickSet(wb0.tpick, wb0.ipick, wb0.phase, wb0.pick_mask, pair_idx, pair_valid)
    n_t = wb0.lbl_grid.shape[-1]
    queries = QuerySet(
        x_query=wb0.x_query,
        x_query_idx=build_query_attachment(ctx.grids_cart[g], wb0.x_query, k=cfg.graph.k_spatial_attn),
        t_query=jnp.linspace(-cfg.model.t_win / 2, cfg.model.t_win / 2, n_t)[:, None],
        x_qsrc=wb0.x_qsrc,
        x_qsrc_idx=build_query_attachment(ctx.grids_cart[g], wb0.x_qsrc, k=cfg.graph.k_spatial_attn),
        tq_sample=wb0.tq_sample,
        trv_qsrc=trv_from_cart(ctx.sta_cart, wb0.x_qsrc),
    )
    # jit the init: flax init otherwise executes eagerly op-by-op, which is
    # very slow on remote/tunneled backends
    params = jax.jit(model.init)(ki, wb0.feat, wb0.mask, graph, ctx.sta_cart,
                                 picks, queries)
    opt_state = optimizer.init(params)
    return TrainState(params, opt_state, jnp.zeros((), jnp.int32))
