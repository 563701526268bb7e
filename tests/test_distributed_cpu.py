"""Multi-host path: the source-partitioned halo-exchange aggregation over a
2-process ``jax.distributed`` CPU cluster (Gloo collectives standing in for
DCN/ICI). SURVEY §4's multi-host prescription — correctness of the
cross-process ``all_to_all`` our trunk rides, not just the single-process
virtual mesh the other tests use."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = textwrap.dedent("""
    import sys
    import numpy as np
    import jax

    jax.distributed.initialize(coordinator_address="localhost:%PORT%",
                               num_processes=2, process_id=int(sys.argv[1]))
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from genie_tpu.graphs.build import build_source_graph
    from genie_tpu.ops.segment import gather_mean_src_axis
    from genie_tpu.parallel.product_shard import (build_partition,
                                                  sharded_src_aggregation)

    devs = jax.devices()
    assert len(devs) == 4, devs  # 2 procs x 2 local CPU devices
    mesh = Mesh(np.array(devs), ("src",))

    # identical inputs on both processes (fixed seed)
    rng = np.random.default_rng(0)
    n_src, n_sta, c = 64, 6, 4
    src_pos = rng.uniform(-50e3, 50e3, (n_src, 3)).astype(np.float32)
    feat = rng.normal(size=(n_src, n_sta, c)).astype(np.float32)
    src_nbr = np.asarray(build_source_graph(src_pos, 5))
    part = build_partition(src_pos, src_nbr, 4)

    want = np.asarray(gather_mean_src_axis(jnp.asarray(feat),
                                           jnp.asarray(src_nbr)))

    perm = np.asarray(part.perm)
    # host_local_array_to_global_array takes only THIS process's rows
    pid = jax.process_index()
    n_per_proc = n_src // 2
    local_rows = feat[perm][pid * n_per_proc:(pid + 1) * n_per_proc]
    x_sorted = multihost_utils.host_local_array_to_global_array(
        local_rows, mesh, P("src", None, None))
    got_g = sharded_src_aggregation(x_sorted, part, mesh)
    got_sorted = multihost_utils.process_allgather(got_g, tiled=True)
    got = np.asarray(got_sorted)[np.asarray(part.inv_perm)]

    assert np.allclose(got, want, atol=1e-5), \\
        float(np.abs(got - want).max())
    print(f"proc {sys.argv[1]} OK", flush=True)
""")


@pytest.mark.slow
def test_halo_exchange_across_two_processes(tmp_path):
    with socket.socket() as s:  # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("GENIE_TPU_TEST_REEXEC", None)

    prog = _CHILD.replace("%PORT%", str(port))
    procs = [subprocess.Popen([sys.executable, "-c", prog, str(i)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} OK" in out, out
