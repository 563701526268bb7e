import numpy as np
import jax
import jax.numpy as jnp
import pytest

from genie_tpu.ops.pallas_fused import (
    fused_dual_round,
    fused_dual_round_reference,
)


def _inputs(seed=0, n_src=64, n_sta=16, c=8, m=4, h=8):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n_src, n_sta, c)).astype(np.float32)
    agg_src = rng.normal(size=(n_src, n_sta, c)).astype(np.float32)
    mask = (rng.random((n_src, n_sta, m)) > 0.5).astype(np.float32)
    a_sta = rng.random((n_sta, n_sta)).astype(np.float32)
    a_sta /= a_sta.sum(1, keepdims=True)
    w1 = rng.normal(size=(2 * c + m, h)).astype(np.float32) * 0.3
    b1 = rng.normal(size=(h,)).astype(np.float32)
    w2 = rng.normal(size=(2 * c + m, h)).astype(np.float32) * 0.3
    b2 = rng.normal(size=(h,)).astype(np.float32)
    slopes = np.asarray([0.25, 0.25, 0.25], np.float32)
    return tuple(map(jnp.asarray, (x, agg_src, mask, a_sta, w1, b1, w2, b2, slopes)))


def test_fused_round_matches_reference_interpret():
    """Kernel semantics vs the XLA twin (interpreter mode on CPU)."""
    args = _inputs()
    want = np.asarray(fused_dual_round_reference(*args))
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_dual_round(*args))
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=2e-5)
