import numpy as np
import jax
import jax.numpy as jnp

from genie_tpu.models.travel_time_pinn import (
    ScaleParams,
    TravelTimePN,
    TravelTimesPN,
    scales_from_domain,
    train_pinn,
)


def test_pinn_learns_homogeneous_medium():
    """Short training on exact homogeneous times: predictions must approach
    t = d/v well beyond the untrained network's error."""
    v_true = 5000.0
    L = 100e3
    scales = scales_from_domain([0.0, 0.0, -20e3], L, L / 3000.0, [v_true, v_true / 1.8])

    def sample_fn(key, n):
        k1, k2 = jax.random.split(key)
        sta = jax.random.uniform(k1, (n, 3), minval=-0.5, maxval=0.5)
        sta = sta.at[:, 2].set(0.0)
        src = jax.random.uniform(k2, (n, 3), minval=-0.5, maxval=0.5)
        d = jnp.linalg.norm((sta - src) * L, axis=-1, keepdims=True)
        t = jnp.concatenate((d / v_true, d / (v_true / 1.8)), axis=1) / scales.t_scale
        return sta, src, t

    model = TravelTimesPN()
    params = train_pinn(jax.random.PRNGKey(0), model, scales, sample_fn,
                        n_steps=300, batch=512, lr=2e-3)

    tt = TravelTimePN(model, params, scales)
    rng = np.random.default_rng(0)
    sta = rng.uniform(-0.4 * L, 0.4 * L, (10, 3)).astype(np.float32)
    sta[:, 2] = 0.0
    src = rng.uniform(-0.4 * L, 0.4 * L, (20, 3)).astype(np.float32)
    src[:, 2] -= 20e3
    got = np.asarray(tt.from_cart(jnp.asarray(sta) + scales.center,
                                  jnp.asarray(src) + scales.center))
    d = np.linalg.norm((src[:, None] + np.asarray(scales.center)) -
                       (sta[None, :] + np.asarray(scales.center)), axis=-1)
    want_p = d / v_true
    want_s = d / (v_true / 1.8)
    rel_p = np.abs(got[:, :, 0] - want_p) / np.maximum(want_p, 1.0)
    rel_s = np.abs(got[:, :, 1] - want_s) / np.maximum(want_s, 1.0)
    assert np.median(rel_p) < 0.10
    assert np.median(rel_s) < 0.10


def test_pinn_differentiable_for_relocation():
    scales = scales_from_domain([0.0, 0.0, 0.0], 1e5, 30.0, [5000.0, 2800.0])
    model = TravelTimesPN()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)), jnp.zeros((1, 3)),
                        scales.conversion_factor, scales.v_mean, scales.t_scale,
                        method=TravelTimesPN.init_all)
    tt = TravelTimePN(model, params, scales)
    sta = jnp.asarray(np.random.default_rng(0).normal(size=(5, 3)).astype(np.float32) * 1e4)

    def f(x):
        return tt.from_cart(sta, x[None]).sum()

    g = jax.grad(f)(jnp.asarray([1e4, -2e4, -5e3], jnp.float32))
    assert np.isfinite(np.asarray(g)).all()


def test_velocity_r2_helper():
    from genie_tpu.models.travel_time_pinn import velocity_r2
    scales = scales_from_domain([0.0, 0.0, 0.0], 1e5, 30.0, [5000.0, 2800.0])
    model = TravelTimesPN()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)), jnp.zeros((1, 3)),
                        scales.conversion_factor, scales.v_mean, scales.t_scale,
                        method=TravelTimesPN.init_all)
    src = np.random.default_rng(0).uniform(-0.5, 0.5, (50, 3)).astype(np.float32)
    v_true = np.full((50, 2), 5000.0, np.float32)
    r2 = velocity_r2(model, params, scales, src, v_true)
    assert r2.shape == (2,)
    assert np.isfinite(r2).all()
