import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from genie_tpu.graphs.build import build_source_graph
from genie_tpu.ops.segment import gather_mean_src_axis
from genie_tpu.parallel.mesh import make_mesh
from genie_tpu.parallel.product_shard import (
    build_partition,
    sharded_src_aggregation,
)


def test_sharded_aggregation_matches_dense():
    """Source-partitioned halo-exchange aggregation must equal the dense
    single-device gather_mean_src_axis exactly."""
    rng = np.random.default_rng(0)
    n_src, n_sta, c = 128, 6, 5
    src_pos = rng.uniform(-50e3, 50e3, (n_src, 3)).astype(np.float32)
    feat = rng.normal(size=(n_src, n_sta, c)).astype(np.float32)
    src_nbr = np.asarray(build_source_graph(src_pos, 7))

    n_shards = 8
    part = build_partition(src_pos, src_nbr, n_shards)
    mesh = make_mesh(n_shards, axis_names=("src",))

    # dense reference (original order)
    want = np.asarray(gather_mean_src_axis(jnp.asarray(feat), jnp.asarray(src_nbr)))

    # sharded computation in sorted order
    perm = np.asarray(part.perm)
    feat_sorted = jnp.asarray(feat[perm])
    got_sorted = np.asarray(sharded_src_aggregation(feat_sorted, part, mesh))
    got = got_sorted[np.asarray(part.inv_perm)]

    assert np.allclose(got, want, atol=1e-5)


def test_partition_halo_is_thin():
    """Morton ordering should keep the halo well below the full row count."""
    rng = np.random.default_rng(1)
    n_src = 512
    src_pos = rng.uniform(0, 100e3, (n_src, 3)).astype(np.float32)
    src_nbr = np.asarray(build_source_graph(src_pos, 15))
    part = build_partition(src_pos, src_nbr, 8)
    assert part.halo_pad < n_src // 8  # halo smaller than a full shard
