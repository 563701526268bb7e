"""High-level workflow: ties project files → travel times → domain context →
training → continuous processing (the reference's script-level pipeline as
library calls; see ``scripts/`` for the CLI wrappers)."""

from __future__ import annotations

import os
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


def build_velocity_volume(cfg: Config, proj: Projection, lo, shape, h,
                          vel_model=None, surface_lla=None,
                          air_velocity: float = 343.0):
    """(Vp, Vs) volumes on the FMM grid, supporting the reference's three
    velocity-model types (calculate_travel_times_3D_build_data.py:240-302)
    plus topography air-masking (:305-347):

    ``vel_model`` is None (1-D profile from ``cfg.velocity``) or a dict:
      * ``{"type": "1d", "depths", "vp", "vs"}`` — depth profile;
      * ``{"type": "3d", "points_lla" (n,3), "vp" (n,), "vs" (n,)}`` —
        scattered 3-D model, nearest-neighbor assigned (ref type 2);
      * ``{"type": "profiles", "profiles": [{"coor" (lat, lon),
        "radius_km", "depths", "vp", "vs"}, ...]}`` — a set of regional 1-D
        profiles, each grid cell taking the profile whose (radius-normalized)
        horizontal distance is smallest (ref type 3).

    ``surface_lla``: (n, 3) lat/lon/elevation(m) points; grid cells above the
    (nearest-neighbor) surface get acoustic ``air_velocity`` — the
    reference's topography clipping. Station/region points outside the data
    are treated as sea level by passing a sparse surface.
    """
    from scipy.spatial import cKDTree

    shape = tuple(int(s) for s in shape)
    zs = lo[2] + np.arange(shape[2]) * h

    if vel_model is None or vel_model.get("type", "1d") == "1d":
        vm = vel_model or {}
        depths = np.asarray(vm.get("depths", cfg.velocity.depths), float)
        vp_p = np.asarray(vm.get("vp", cfg.velocity.vp), float)
        vs_p = np.asarray(vm.get("vs", cfg.velocity.vs), float)
        order = np.argsort(depths)
        vp = np.interp(zs, depths[order], vp_p[order]).astype(np.float32)
        vs = np.interp(zs, depths[order], vs_p[order]).astype(np.float32)
        vol_p = np.broadcast_to(vp[None, None, :], shape).copy()
        vol_s = np.broadcast_to(vs[None, None, :], shape).copy()
    else:
        ax = [lo[i] + np.arange(shape[i]) * h for i in range(3)]
        xx = np.stack(np.meshgrid(*ax, indexing="ij"), axis=-1).reshape(-1, 3)
        if vel_model["type"] == "3d":
            pts = np.asarray(proj.to_cart_np(
                np.asarray(vel_model["points_lla"], np.float64)))
            j = cKDTree(pts).query(xx)[1]
            vol_p = np.asarray(vel_model["vp"], np.float32)[j].reshape(shape)
            vol_s = np.asarray(vel_model["vs"], np.float32)[j].reshape(shape)
        elif vel_model["type"] == "profiles":
            best = np.full(len(xx), np.inf)
            vol_p = np.zeros(len(xx), np.float32)
            vol_s = np.zeros(len(xx), np.float32)
            for prof in vel_model["profiles"]:
                la, lon = prof["coor"]
                c = np.asarray(proj.to_cart_np(
                    np.array([[la, lon, 0.0]], np.float64)))[0]
                d = (np.linalg.norm(xx[:, :2] - c[None, :2], axis=1)
                     / (float(prof["radius_km"]) * 1e3))
                sel = d < best
                best[sel] = d[sel]
                order = np.argsort(np.asarray(prof["depths"], float))
                dd = np.asarray(prof["depths"], float)[order]
                vol_p[sel] = np.interp(xx[sel, 2], dd,
                                       np.asarray(prof["vp"], float)[order])
                vol_s[sel] = np.interp(xx[sel, 2], dd,
                                       np.asarray(prof["vs"], float)[order])
            vol_p = vol_p.reshape(shape)
            vol_s = vol_s.reshape(shape)
        else:
            raise ValueError(f"unknown vel_model type {vel_model['type']!r}")

    if surface_lla is not None:
        surf = np.asarray(surface_lla, np.float64)
        surf_cart = np.asarray(proj.to_cart_np(
            np.concatenate((surf[:, :2], np.zeros((len(surf), 1))), axis=1)))
        ax01 = [lo[i] + np.arange(shape[i]) * h for i in range(2)]
        gx, gy = np.meshgrid(*ax01, indexing="ij")
        grid_xy = np.stack((gx.ravel(), gy.ravel()), axis=-1)
        j = cKDTree(surf_cart[:, :2]).query(grid_xy)[1]
        elev = surf[j, 2].reshape(shape[0], shape[1])
        air = zs[None, None, :] > elev[:, :, None]
        vol_p = np.where(air, np.float32(air_velocity), vol_p)
        vol_s = np.where(air, np.float32(air_velocity), vol_s)
    return vol_p, vol_s


def fmm_grid_box(cfg: Config, proj: Projection):
    """(lo, shape, h): Cartesian box covering the padded region."""
    h = cfg.travel_time.dx
    corners = []
    for la in cfg.region.lat_range_extend:
        for lo_ in cfg.region.lon_range_extend:
            for dz in cfg.region.depth_range:
                corners.append([la, lo_, dz])
    cc = np.asarray(proj.to_cart_np(np.asarray(corners)), np.float64)
    lo = cc.min(axis=0) - 2 * h
    hi = cc.max(axis=0) + 2 * h
    shape = tuple(int(np.ceil((hi[i] - lo[i]) / h)) + 1 for i in range(3))
    return lo, shape, h


def build_fmm_tables(cfg: Config, proj: Projection, sta_lla, out_dir,
                     station_indices=None, verbose=True, vel_model=None,
                     surface_lla=None):
    """Per-station FMM travel-time volumes over the padded region
    (calculate_travel_times_3D_build_data.py). Job-shardable by
    ``station_indices`` (the reference's argv job arrays). Saves
    ``{out_dir}/travel_time_grid_station_{j}.npz``. ``vel_model`` /
    ``surface_lla`` select 3-D or multi-profile velocities and topography
    masking (see :func:`build_velocity_volume`)."""
    from genie_tpu.native.fmm import fast_march

    sta_cart = np.asarray(proj.to_cart_np(sta_lla), np.float32)
    lo, shape, h = fmm_grid_box(cfg, proj)
    vol_p, vol_s = build_velocity_volume(cfg, proj, lo, shape, h,
                                         vel_model=vel_model,
                                         surface_lla=surface_lla)

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    idxs = range(len(sta_cart)) if station_indices is None else station_indices
    for j in idxs:
        out_path = out_dir / f"travel_time_grid_station_{j}.npz"
        if out_path.exists():
            continue  # idempotent restart (shard jobs may be re-run)
        t0 = time.time()
        Tp = fast_march(vol_p, h, sta_cart[j][None], origin=lo)
        Ts = fast_march(vol_s, h, sta_cart[j][None], origin=lo)
        # atomic publish: the idempotent-restart skip above trusts existence,
        # so a shard killed mid-save must never leave a truncated file behind
        # (dotfile so globs/ls of completed tables never count it; keeps the
        # .npz suffix or np.savez would append another one)
        tmp_path = out_path.with_name(
            f".tmp_{out_path.stem}.{os.getpid()}.npz")
        np.savez_compressed(tmp_path, Tp=Tp, Ts=Ts, origin=lo, h=h, shape=shape)
        os.replace(tmp_path, out_path)
        if verbose:
            print(f"station {j}: fmm {time.time() - t0:.1f}s grid {shape}")
    return shape, lo, h


def rasterize_surface(proj, surface_lla, lo_xy, hi_xy, n: int = 64):
    """Rasterize scattered (lat, lon, elev m) topography points onto an
    (n, n) projected-coordinate grid: the synth generator's depth-clamp
    input (``DomainContext.surface``). Returns (elev (n, n), lo (2,), h (2,))."""
    from scipy.spatial import cKDTree

    surf = np.asarray(surface_lla, np.float64)
    pts = np.asarray(proj.to_cart_np(
        np.concatenate((surf[:, :2], np.zeros((len(surf), 1))), axis=1)))
    lo_xy = np.asarray(lo_xy, np.float64)[:2]
    hi_xy = np.asarray(hi_xy, np.float64)[:2]
    h = (hi_xy - lo_xy) / (n - 1)
    ax = [lo_xy[i] + np.arange(n) * h[i] for i in range(2)]
    gx, gy = np.meshgrid(*ax, indexing="ij")
    j = cKDTree(pts[:, :2]).query(
        np.stack((gx.ravel(), gy.ravel()), axis=-1))[1]
    elev = surf[j, 2].reshape(n, n).astype(np.float32)
    return elev, lo_xy.astype(np.float32), h.astype(np.float32)


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
    surface = None
    if cfg.travel_time.use_topography:
        surf_path = Path(root) / f"{cfg.region.name}_surface.npz"
        if surf_path.exists():
            surf_lla = np.load(surf_path)["lla"]
            lo, shape, h = fmm_grid_box(cfg, proj)
            hi = [lo[i] + (shape[i] - 1) * h for i in range(2)]
            surface = rasterize_surface(proj, surf_lla, lo[:2], hi)
    ctx = build_domain_context(cfg, sta_lla, sta_cart, grids_lla, grids_cart,
                               trv_grids, surface=surface)
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
                     use_absolute_pos=cfg.model.use_absolute_pos,
                     use_updated_model_definition=cfg.model.use_updated_model_definition,
                     normalize_readin=cfg.model.normalize_readin)
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
