#!/usr/bin/env python
"""Build NC FMM travel-time tables (sharded by station index)."""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from nc_common import nc_config, nc_projection, PROJECT_ROOT
from genie_tpu.workflow import build_fmm_tables

job, n_jobs = int(sys.argv[1]), int(sys.argv[2])
cfg, sta_lla = nc_config()
proj = nc_projection(cfg)
idxs = [j for j in range(len(sta_lla)) if j % n_jobs == job]
build_fmm_tables(cfg, proj, sta_lla, PROJECT_ROOT / "TravelTimeData",
                 station_indices=idxs)
