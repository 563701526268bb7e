"""Device mesh + sharding strategy.

The reference has no in-process parallelism at all — its "distribution" is
shell job arrays over a shared filesystem (SURVEY §2.11). Here the axes are:

  * ``batch`` — data parallelism over synthetic training windows and
    inference windows (replaces job arrays for on-device work);
  * ``src``   — model/graph parallelism: the product graph is partitioned by
    source-grid nodes; station-axis aggregation is local per shard (stations
    replicated), source-axis aggregation crosses shards and rides ICI
    collectives (see ``genie_tpu.parallel.product_shard``).

Training uses ``batch`` sharding (gradients are reduced automatically by jit
under NamedSharding); pod-scale inference on ~1M-node grids uses ``src``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_names=("batch",)) -> Mesh:
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    shape = (n_devices,) + (1,) * (len(axis_names) - 1)
    return Mesh(np.array(devs[:n_devices]).reshape(shape), axis_names)


def shard_leading_axis(tree, mesh: Mesh, axis: str = "batch"):
    """Place every array in ``tree`` with its leading axis sharded over
    ``axis`` (the window/data axis); scalars and mismatched arrays are
    replicated."""
    n = mesh.shape[axis]

    def put(x):
        x = jax.numpy.asarray(x)
        if x.ndim >= 1 and x.shape[0] % n == 0:
            spec = P(axis, *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def replicate(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(jax.numpy.asarray(x), NamedSharding(mesh, P())), tree
    )
