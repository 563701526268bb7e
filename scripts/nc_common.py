"""Shared NC (northern-California EHZ) project definition for the BSSA
"100 continuous days" benchmark scripts.

One place for the domain config so the FMM build, PINN training, detector
training, and day processing all agree (the reference keeps this contract in
``config.yaml`` + the ``*_losses.npz`` checkpoint snapshot).
"""

import os
from pathlib import Path

import numpy as np

# Persistent XLA compilation cache: the NC train step takes 10-25 min to
# compile over the tunneled backend, and the campaign kills/restarts the
# trainer around evaluation (plus watchdog restarts). jax reads these at
# first import; nc_common is imported before jax in every nc_* script.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/projects/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

BSSA = Path("/root/reference/BSSA")
DATASETS = {
    "100": BSSA / "Datasets" / "100 continuous days test",
    "500": BSSA / "Datasets" / "500 random day test",
}
DAYS_DIR = DATASETS["100"]
PROJECT_ROOT = Path("/root/repo/projects/NC_EHZ")


def load_network():
    z = np.load(BSSA / "NC_EHZ_network.npz", allow_pickle=True)
    return z["locs"], z["stas"]


def nc_config(n_src: int = 500, n_grids: int = 2, n_batch: int = 8,
              max_picks: int = 512):
    from genie_tpu.config import Config

    sta_lla, _ = load_network()
    cfg = Config()
    cfg.region.name = "NC_EHZ"
    cfg.region.lat_range = (float(sta_lla[:, 0].min()), float(sta_lla[:, 0].max()))
    cfg.region.lon_range = (float(sta_lla[:, 1].min()), float(sta_lla[:, 1].max()))
    cfg.region.depth_range = (-40e3, 2e3)
    cfg.graph.max_sta = sta_lla.shape[0]
    cfg.graph.n_spatial_nodes = n_src
    cfg.graph.n_grids = n_grids
    cfg.graph.max_picks = max_picks
    cfg.train.n_batch = n_batch
    cfg.train.n_spc_query = 2000
    cfg.train.n_src_query = 96
    cfg.synth.max_events = 96
    cfg.synth.n_false_max = 2048
    cfg.synth.T = 3600.0
    cfg.synth.max_rate_events = 40.0
    cfg.synth.dist_range = (15e3, 350e3)
    cfg.train.sequential_windows = True  # 374-sta x 500-node scale OOMs vmapped
    cfg.travel_time.dx = 1500.0  # NC box is 351x496x42 km: 2.3M cells/volume
    return cfg, sta_lla


def nc_projection(cfg):
    from genie_tpu.geometry import Projection

    return Projection.from_center(cfg.region.center)


def load_day(day: str, t_end: float = 86400.0, dataset: str = "100",
             return_amp: bool = False):
    """(pick_t s, pick_sta, pick_phase, prob, sta_ind_use, usgs_cat,
    ref_srcs_trv) [+ amplitudes with ``return_amp``].

    Handles both BSSA pick schemas (100-days README: 4 columns
    t/sta/phase/prob; 500-days README: 5 columns t/sta/amp/prob/phase —
    the canonical format of the reference's process_continuous_days.py).
    """
    import h5py

    days_dir = DATASETS[dataset]
    p = np.load(days_dir / "Picks" / f"{day}_NC_EHZ_picks_ver_1.npz",
                allow_pickle=True)
    P = p["P"]
    pick_t = P[:, 0] / 100.0  # 100 Hz sample index -> seconds
    pick_sta = P[:, 1].astype(np.int64)
    if P.shape[1] >= 5:  # 500-day schema: amp, prob, phase
        amp = P[:, 2].astype(np.float32)
        prob = P[:, 3]
        pick_phase = P[:, 4].astype(np.float32)
    else:  # 100-day schema: phase, prob
        amp = None
        pick_phase = P[:, 2].astype(np.float32)
        prob = P[:, 3]
    sta_ind_use = p["sta_ind_use"].astype(np.int64)

    src_file = days_dir / "Sources" / f"{day}_NC_EHZ_sources_ver_1.hdf5"
    cat = srcs_trv = None
    with h5py.File(src_file, "r") as f:
        for k in f.keys():
            if k.endswith("_cat"):
                cat = np.asarray(f[k])
            if k.endswith("_srcs_trv"):
                srcs_trv = np.asarray(f[k])
    base = (pick_t, pick_sta, pick_phase, prob, sta_ind_use, cat, srcs_trv)
    return base + (amp,) if return_amp else base


def list_days(dataset: str = "100"):
    return sorted(p.name.split("_NC_EHZ")[0]
                  for p in (DATASETS[dataset] / "Picks").glob("*_picks_ver_1.npz"))
