#!/usr/bin/env python
"""MEASURE (not just model) the sharded trunk's communication overhead on
the 8-device virtual CPU mesh — the companion to ``scaling_model.py``'s
analytic 0.87 efficiency.

What is honestly measurable without multi-chip hardware:
  * the halo-row fraction the static plan actually exchanges (exact);
  * wall time of the sharded source aggregation WITH the all_to_all halo
    exchange vs an identical program with the exchange elided (same gathers,
    zero halo) — the measured comm fraction of the round;
  * the dense single-array aggregation as a sanity baseline.

On virtual CPU devices the all_to_all is a host memcpy, so the measured comm
fraction is a *structural* overhead number (dispatch + copy + reshuffle),
not an ICI bandwidth measurement — the ICI projection stays with
``scaling_model.py``. Both land in RESULTS.md side by side.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        PYTHONPATH= python scripts/measure_scaling.py
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

# clean re-exec: drop the injected TPU PJRT plugin, pin CPU, 8 devices
if os.environ.get("PALLAS_AXON_POOL_IPS") and os.environ.get("GENIE_REEXEC") != "1":
    env = dict(os.environ)
    env.update(PYTHONPATH="", JAX_PLATFORMS="cpu", GENIE_REEXEC="1",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    os.execve(sys.executable, [sys.executable] + sys.argv, env)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def timeit(fn, *args, reps=20):
    import jax
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else \
        jax.block_until_ready(fn(*args))  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-src", type=int, default=8192)
    ap.add_argument("--n-sta", type=int, default=128)
    ap.add_argument("--channels", type=int, default=30)
    ap.add_argument("--k-src", type=int, default=15)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from genie_tpu.graphs.build import build_source_graph
    from genie_tpu.ops.segment import gather_mean_src_axis
    from genie_tpu.parallel.mesh import make_mesh
    from genie_tpu.parallel.product_shard import (build_partition,
                                                  sharded_gather_mean_src_axis)

    n_shards = len(jax.devices())
    rng = np.random.default_rng(0)
    # clustered cloud (realistic seismicity) — same recipe as scaling_model
    n_bg = int(0.4 * args.n_src)
    centers = rng.uniform(-250e3, 250e3, (12, 3)) * np.array([1, 1, 0.05])
    cl = (centers[rng.integers(0, 12, args.n_src - n_bg)]
          + rng.normal(0, 15e3, (args.n_src - n_bg, 3)) * np.array([1, 1, 0.3]))
    bg = rng.uniform(-300e3, 300e3, (n_bg, 3)) * np.array([1, 1, 0.066])
    src_pos = np.concatenate((cl, bg)).astype(np.float32)

    src_nbr = np.asarray(build_source_graph(src_pos, args.k_src))
    part = build_partition(src_pos, src_nbr, n_shards)
    mesh = make_mesh(n_shards, axis_names=("src",))

    halo_rows = part.halo_rows_valid
    halo_moved = part.halo_rows_moved
    halo_frac = halo_rows / args.n_src
    feat = rng.normal(size=(args.n_src, args.n_sta,
                            args.channels)).astype(np.float32)
    x_sorted = jnp.asarray(feat[np.asarray(part.perm)])

    # sharded WITH halo exchange (production program)
    def f_halo(x_local):
        sid = jax.lax.axis_index("src")
        return sharded_gather_mean_src_axis(x_local, part, sid, "src")

    # identical gathers, halo elided (compute-only bound)
    def f_local(x_local):
        sid = jax.lax.axis_index("src")
        halo = jnp.zeros((part.halo_total,) + x_local.shape[1:],
                         x_local.dtype)
        x_ext = jnp.concatenate((x_local, halo), axis=0)
        nbr = part.local_nbr[sid]
        return x_ext[nbr].mean(axis=1)

    run_halo = jax.jit(shard_map(f_halo, mesh=mesh,
                                 in_specs=P("src", None, None),
                                 out_specs=P("src", None, None)))
    run_local = jax.jit(shard_map(f_local, mesh=mesh,
                                  in_specs=P("src", None, None),
                                  out_specs=P("src", None, None)))
    run_dense = jax.jit(lambda x, nbr: gather_mean_src_axis(x, nbr))

    t_halo = timeit(run_halo, x_sorted, reps=args.reps)
    t_local = timeit(run_local, x_sorted, reps=args.reps)
    t_dense = timeit(run_dense, jnp.asarray(feat), jnp.asarray(src_nbr),
                     reps=args.reps)

    comm_frac = max(0.0, (t_halo - t_local) / t_halo)
    eff_structural = t_local / t_halo  # no-overlap efficiency, measured

    out = {
        "n_src": args.n_src, "n_sta": args.n_sta, "channels": args.channels,
        "k_src": args.k_src, "n_shards": n_shards,
        "halo_rows_exchanged": halo_rows,
        "halo_rows_moved_padded": halo_moved,
        "halo_padding_overhead": round(halo_moved / max(halo_rows, 1), 3),
        "halo_row_fraction": round(halo_frac, 4),
        "t_sharded_with_halo_ms": round(t_halo * 1e3, 3),
        "t_sharded_local_only_ms": round(t_local * 1e3, 3),
        "t_dense_single_ms": round(t_dense * 1e3, 3),
        "measured_comm_fraction": round(comm_frac, 4),
        "measured_structural_efficiency": round(eff_structural, 4),
        "note": "virtual 8-device CPU mesh: comm = host memcpy, so this is "
                "a structural overhead bound; ICI projection in "
                "scaling_model.py",
    }
    print(json.dumps(out, indent=1))
    if args.json_out:
        Path(args.json_out).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
