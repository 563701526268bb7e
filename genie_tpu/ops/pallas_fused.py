"""Pallas TPU kernel: fused dual-relation aggregation round.

One round of the DataAggregation conv (ref module.py:90-92) is, per product
row block:

    agg_sta = A_sta ⊗ act11(x)          (station-axis mean, MXU matmul)
    h1      = [x ‖ agg_sta ‖ mask] @ W1 + b1
    h2      = [x ‖ agg_src ‖ mask] @ W2 + b2
    out     = PReLU([h1 ‖ h2])

XLA materializes agg_sta, both concats and h1/h2 in HBM between fused
regions; this kernel keeps the whole round in VMEM per source-row block —
the only HBM traffic is x, agg_src (the cross-block source-axis aggregation,
one XLA matmul computed outside) and the final output. Forward-only: used in
the inference detection sweep, where no gradients are needed (training keeps
the XLA path, which autodiffs).

Block layout: grid over n_src blocks; per block the full (n_sta, ·) station
axis stays resident (n_sta ≤ a few hundred ⇒ KBs).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _prelu(x, a):
    return jnp.maximum(x, 0.0) + a * jnp.minimum(x, 0.0)


def _round_kernel(x_ref, aggsrc_ref, mask_ref, a_sta_ref, w1_ref, b1_ref,
                  w2_ref, b2_ref, slopes_ref, out_ref):
    # x: (BS, n_sta, C); a_sta: (n_sta, n_sta); w1/w2: (C2, H); out: (BS, n_sta, 2H)
    x = x_ref[:]
    a11, a12, a_out = slopes_ref[0], slopes_ref[1], slopes_ref[2]
    agg_sta = jax.lax.dot_general(
        a_sta_ref[:], _prelu(x, a11),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (n_sta, BS, C)
    agg_sta = jnp.transpose(agg_sta, (1, 0, 2))
    cat1 = jnp.concatenate((x, agg_sta, mask_ref[:]), axis=-1)
    cat2 = jnp.concatenate((x, aggsrc_ref[:], mask_ref[:]), axis=-1)
    h1 = jax.lax.dot_general(cat1, w1_ref[:], (((2,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) + b1_ref[:]
    h2 = jax.lax.dot_general(cat2, w2_ref[:], (((2,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) + b2_ref[:]
    out_ref[:] = _prelu(jnp.concatenate((h1, h2), axis=-1), a_out)


@partial(jax.jit, static_argnames=("block_src",))
def fused_dual_round(x, agg_src, mask, a_sta, w1, b1, w2, b2, slopes,
                     block_src: int = 128):
    """x, agg_src: (n_src, n_sta, C); mask: (n_src, n_sta, M);
    a_sta: (n_sta, n_sta) row-stochastic; w1/w2: (2C+M, H); slopes: (3,)
    PReLU slopes (act11, act12-is-preapplied-in-agg_src, output).
    Returns (n_src, n_sta, 2H)."""
    n_src, n_sta, c = x.shape
    h = w1.shape[1]
    bs = min(block_src, n_src)
    n_blocks = -(-n_src // bs)
    pad = n_blocks * bs - n_src
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        agg_src = jnp.pad(agg_src, ((0, pad), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, pad), (0, 0), (0, 0)))

    out = pl.pallas_call(
        _round_kernel,
        out_shape=jax.ShapeDtypeStruct((n_blocks * bs, n_sta, 2 * h), x.dtype),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((bs, n_sta, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, n_sta, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, n_sta, mask.shape[-1]), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_sta, n_sta), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w1.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b1.shape, lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b2.shape, lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(slopes.shape, lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bs, n_sta, 2 * h), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(x, agg_src, mask, a_sta, w1, b1, w2, b2, slopes)
    return out[:n_src]


def fused_dual_round_reference(x, agg_src, mask, a_sta, w1, b1, w2, b2, slopes):
    """XLA twin of the kernel (used for testing and as the autodiff path)."""
    agg_sta = jnp.einsum("ij,sjc->sic", a_sta, _prelu(x, slopes[0]))
    cat1 = jnp.concatenate((x, agg_sta, mask), axis=-1)
    cat2 = jnp.concatenate((x, agg_src, mask), axis=-1)
    h1 = cat1 @ w1 + b1
    h2 = cat2 @ w2 + b2
    return _prelu(jnp.concatenate((h1, h2), axis=-1), slopes[2])
