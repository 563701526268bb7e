"""genie_tpu — a TPU-native graph-neural-network earthquake phase associator,
spatio-temporal source localizer, and double-difference relocator.

Built from scratch for JAX/XLA/Pallas/pjit with the capabilities of the GENIE
reference (imcbrearty/GENIE): pick→graph featurization, heterogeneous
message-passing detection+association model, on-the-fly synthetic-data
training, physics-informed travel-time surrogates, continuous-day inference
with clustering/assignment/location post-processing, calibration, magnitudes,
and GraphDD relocation.

Design (TPU-first, not a port):
  * The station×source Cartesian-product graph is represented as a dense
    ``(n_src, n_sta, C)`` feature tensor. Dual-relation aggregation becomes
    fixed-k gathers along one axis (MXU/VPU friendly), never edge-list scatter.
  * All shapes are static: picks, stations, and queries are padded to fixed
    maxima with boolean masks; kNN uses masked distances + top_k.
  * Multi-chip scaling via ``jax.sharding.Mesh`` + ``shard_map`` (see
    ``genie_tpu.parallel``): batch-parallel training, source-partitioned
    product graphs with ICI boundary exchange for pod-scale grids.
"""

__version__ = "0.1.0"

from genie_tpu.config import Config, load_config  # noqa: F401
