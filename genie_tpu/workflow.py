"""High-level workflow: ties project files → travel times → domain context →
training → continuous processing (the reference's script-level pipeline as
library calls; see ``scripts/`` for the CLI wrappers)."""

from __future__ import annotations

import time
from pathlib import Path

import jax
import numpy as np

from genie_tpu.config import Config
from genie_tpu.geometry import Projection
from genie_tpu.models.detector import Detector
from genie_tpu.models.travel_time import HomogeneousTravelTime
from genie_tpu.setup.project import load_project
from genie_tpu.train.trainer import (
    DomainContext,
    build_domain_context,
    init_train_state,
    make_train_step,
)
from genie_tpu.utils import compute_travel_times_chunked


def build_fmm_tables(cfg: Config, proj: Projection, sta_lla, out_dir,
                     station_indices=None, verbose=True):
    """Per-station FMM travel-time volumes over the padded region
    (calculate_travel_times_3D_build_data.py). Job-shardable by
    ``station_indices`` (the reference's argv job arrays). Saves
    ``{out_dir}/travel_time_grid_station_{j}.npz``."""
    from genie_tpu.native.fmm import fast_march

    scale, offset = cfg.region.scale_offset(extend=True)
    h = cfg.travel_time.dx
    sta_cart = np.asarray(proj.to_cart_np(sta_lla), np.float32)
    lo = sta_cart.min(axis=0)
    # Cartesian box covering the padded region (approximate via corners)
    corners = []
    for la in cfg.region.lat_range_extend:
        for lo_ in cfg.region.lon_range_extend:
            for dz in cfg.region.depth_range:
                corners.append([la, lo_, dz])
    cc = np.asarray(proj.to_cart_np(np.asarray(corners)), np.float64)
    lo = cc.min(axis=0) - 2 * h
    hi = cc.max(axis=0) + 2 * h
    shape = tuple(int(np.ceil((hi[i] - lo[i]) / h)) + 1 for i in range(3))

    depths = np.asarray(cfg.velocity.depths, float)
    zs = lo[2] + np.arange(shape[2]) * h
    vp = np.interp(zs, depths, cfg.velocity.vp).astype(np.float32)
    vs = np.interp(zs, depths, cfg.velocity.vs).astype(np.float32)
    vol_p = np.broadcast_to(vp[None, None, :], shape).copy()
    vol_s = np.broadcast_to(vs[None, None, :], shape).copy()

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    idxs = range(len(sta_cart)) if station_indices is None else station_indices
    for j in idxs:
        t0 = time.time()
        Tp = fast_march(vol_p, h, sta_cart[j][None], origin=lo)
        Ts = fast_march(vol_s, h, sta_cart[j][None], origin=lo)
        np.savez_compressed(out_dir / f"travel_time_grid_station_{j}.npz",
                            Tp=Tp, Ts=Ts, origin=lo, h=h, shape=shape)
        if verbose:
            print(f"station {j}: fmm {time.time() - t0:.1f}s grid {shape}")
    return shape, lo, h


def make_trv(cfg: Config, proj: Projection, pinn_path=None):
    """Travel-time callable: PINN weights if available, else homogeneous
    fallback from the mean of the 1-D profile."""
    if pinn_path is not None and Path(pinn_path).exists():
        import pickle

        from genie_tpu.models.travel_time_pinn import (
            ScaleParams, TravelTimePN, TravelTimesPN)
        blob = pickle.loads(Path(pinn_path).read_bytes())
        scales = ScaleParams(**{k: np.asarray(v) for k, v in blob["scales"].items()})
        model = TravelTimesPN()
        return TravelTimePN(model, blob["params"], scales, projection=proj)
    vp = float(np.mean(cfg.velocity.vp))
    vs = float(np.mean(cfg.velocity.vs))
    return HomogeneousTravelTime(proj, vp, vs)


def domain_from_project(root, cfg: Config, trv=None) -> tuple[DomainContext, object, object]:
    """Load project files and assemble the DomainContext."""
    pj = load_project(root, cfg.region.name)
    proj = pj["projection"]
    trv = trv if trv is not None else make_trv(cfg, proj)
    sta_lla = np.asarray(pj["sta_lla"], np.float32)
    sta_cart = np.asarray(proj.to_cart_np(sta_lla), np.float32)
    grids_lla = np.asarray(pj["grids_lla"], np.float32)
    grids_cart = np.stack([np.asarray(proj.to_cart_np(g), np.float32)
                           for g in grids_lla])
    trv_grids = np.stack([
        compute_travel_times_chunked(trv.from_cart, sta_cart, g)
        for g in grids_cart
    ])
    ctx = build_domain_context(cfg, sta_lla, sta_cart, grids_lla, grids_cart,
                               trv_grids)
    return ctx, proj, trv


def train(cfg: Config, ctx: DomainContext, trv, out_dir, n_steps=None,
          log_every: int = 20, seed: int = 0, restart: bool = False,
          profile_at: int | None = None, use_wandb: bool = False):
    """Training driver: jitted step, per-step text log (the reference's
    ``{proj}_output_{ver}.txt`` contract), periodic checkpoints.

    ``profile_at``: capture a ``jax.profiler`` trace of that step into
    ``out_dir/profile`` (the tracing subsystem the reference lacks,
    SURVEY §5). ``use_wandb``: optional metric streaming if wandb is
    importable (the reference's optional wandb hook, train_GENIE_model.py:41).
    """
    from genie_tpu.io import load_checkpoint, save_checkpoint

    wandb = None
    if use_wandb:
        try:
            import wandb as _wandb
            wandb = _wandb
            wandb.init(project=f"genie_tpu_{cfg.region.name}")
        except Exception:
            wandb = None

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    model = Detector(scale_rel=cfg.model.scale_rel,
                     kernel_sig_t=cfg.model.kernel_sig_t,
                     use_phase_types=cfg.model.use_phase_types,
                     use_absolute_pos=cfg.model.use_absolute_pos)
    key = jax.random.PRNGKey(seed)
    state = init_train_state(model, cfg, ctx, trv.from_cart, key)
    if restart:
        state = load_checkpoint(out_dir / "ckpt", state)
    step_fn, _ = make_train_step(model, cfg, ctx, trv.from_cart)
    log_path = out_dir / f"{cfg.region.name}_output_ver_1.txt"
    n_steps = n_steps if n_steps is not None else cfg.train.n_steps
    t0 = time.time()
    start = int(state.step)
    for i in range(start, n_steps):
        key, k = jax.random.split(key)
        if profile_at is not None and i == profile_at:
            with jax.profiler.trace(str(out_dir / "profile")):
                state, metrics = step_fn(state, k)
                jax.block_until_ready(state)
        else:
            state, metrics = step_fn(state, k)
        if wandb is not None and i % log_every == 0:
            wandb.log({k2: float(v) for k2, v in metrics.items()
                       if np.ndim(v) == 0}, step=i)
        if i % log_every == 0 or i == n_steps - 1:
            trgts = np.asarray(metrics["trgts"]).round(2)
            preds = np.asarray(metrics["preds"]).round(2)
            line = (f"step {i} loss {float(metrics['loss']):.5f} "
                    f"grid {float(metrics['loss_grid']):.5f} "
                    f"query {float(metrics['loss_query']):.5f} "
                    f"p {float(metrics['loss_p']):.5f} "
                    f"s {float(metrics['loss_s']):.5f} "
                    f"trgts {trgts} preds {preds} "
                    f"({(time.time() - t0) / max(i - start + 1, 1):.2f}s/step)")
            print(line)
            with open(log_path, "a") as f:
                f.write(line + "\n")
        if (i + 1) % cfg.train.checkpoint_every == 0 or i == n_steps - 1:
            save_checkpoint(out_dir / "ckpt", state, cfg=cfg, step=i + 1)
    return model, state


def process_day(cfg: Config, ctx: DomainContext, trv, model, params,
                pick_file, out_file, t_start=0.0, t_end=86400.0):
    """One day of continuous processing → catalog hdf5."""
    from genie_tpu.infer.pipeline import InferencePipeline
    from genie_tpu.io import load_picks, save_catalog

    t, sta, phase, amp = load_picks(pick_file)
    pipe = InferencePipeline(model, params, cfg, ctx, trv.from_cart)
    events = pipe.process(t.astype(np.float32), sta, phase.astype(np.float32),
                          t_start, t_end)
    save_catalog(out_file, events, pick_t=t, pick_sta=sta)
    return events
