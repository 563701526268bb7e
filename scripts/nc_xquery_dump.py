#!/usr/bin/env python
"""Dump the detection query grid (``x_query``) to a cache file.

The 10k-node query set is kmeans-packed at pipeline init with a fixed key
(pipeline.build_query_grid, ref process_continuous_days.py:436-462 caches
the analogous ``prebuilt_sampling_grid``).  Because the Lloyd iterations run
on whatever backend is active, the node positions are backend-exact: the
cached day sweeps (series rows) refer to the TPU-computed grid.  This script
computes it ONCE on the current backend and saves it so that (a) CPU-side
diagnosis scripts read the exact grid the cached sweeps were scored on and
(b) nc_process skips the per-run kmeans.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from nc_common import PROJECT_ROOT


def main(n_query: int = 10000):
    import jax
    from genie_tpu.graphs.build import kmeans_packing

    z = np.load(PROJECT_ROOT / "Grids" / "grids_500.npz")
    gc = z["grids_cart"].reshape(-1, 3)
    cart_min = gc.min(axis=0)
    cart_max = gc.max(axis=0)
    # exactly pipeline.build_query_grid(PRNGKey(11), ctx, n, n_steps=100)
    v = kmeans_packing(jax.random.PRNGKey(11), cart_max - cart_min, cart_min,
                       n_query, lambda x: x,
                       weight=np.array([1.0, 1.0, 2.5]), n_steps=100)
    out = PROJECT_ROOT / "Grids" / f"x_query_{n_query}.npy"
    np.save(out, np.asarray(v, np.float32))
    print(f"saved {out} on backend {jax.default_backend()}: "
          f"{n_query} nodes, box {cart_min} .. {cart_max}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10000)
