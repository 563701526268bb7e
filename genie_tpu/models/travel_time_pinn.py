"""Physics-informed neural travel-time surrogate.

Flax twins of the reference's ``VModel`` (module.py:1374-1414) and
``TravelTimesPN`` (module.py:1416-1586), trained as in
``calculate_travel_times_3D_train_model.py``: eikonal PDE residual
(‖∇T‖ = 1/v via autodiff — one ``jax.grad`` instead of the reference's four
``torch.autograd.grad`` calls, ref :806-826), station boundary loss (:830-838),
fast-marching data loss (:850-857), causality/sign loss (:859-865), and
initial-velocity damping (:875-881).

Architecture: sin-activated residual MLPs — a 10-d source embedding net, a
homogeneous baseline ``conversion_factor·‖Δx‖/v_mean``, and two perturbation
branches (relative-offset and absolute-position) merged by an MLP; inference
applies ``relu(inorm_time(base + pred))``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np
import optax

from genie_tpu.models.layers import PReLU


class ScaleParams(NamedTuple):
    """Normalization scalars persisted with the weights (the reference's
    ``scale_params`` npz contract, ref :1242-1246)."""

    center: jnp.ndarray   # (3,) Cartesian centre
    x_scale: jnp.ndarray  # scalar — max extent (m)
    t_scale: jnp.ndarray  # scalar — max travel time (s)
    v_mean: jnp.ndarray   # (n_phases,) mean velocities (m/s)

    @property
    def conversion_factor(self):
        return self.x_scale / self.t_scale


def _sin_block(x, d1, d2, d3):
    x1 = jnp.sin(d1(x))
    x2 = jnp.sin(d2(x1)) + x1
    return jnp.sin(d3(x2)) + x2


class VModel(nn.Module):
    """Velocity net: sin-residual MLP → Softplus; Vs = Vp × ratio."""

    n_phases: int = 2
    n_hidden: int = 50
    n_embed: int = 10

    @nn.compact
    def __call__(self, src_n, embed):
        h = self.n_hidden
        x = jnp.concatenate((src_n, embed), axis=-1)
        x1 = _sin_block(x, nn.Dense(h, name="fc1_1"), nn.Dense(h, name="fc1_2"),
                        nn.Dense(h, name="fc1_3"))
        outs = [jax.nn.softplus(nn.Dense(1, name=f"fc1_4_{j}")(x1))
                for j in range(self.n_phases)]
        lout = [outs[0]] + [outs[0] * outs[j] for j in range(1, self.n_phases)]
        return jnp.concatenate(lout, axis=-1)


class TravelTimesPN(nn.Module):
    """``per_phase_base``: feed the per-phase normalized baseline times
    (conversion_factor·‖Δx‖/v̄, n_phases columns) to the two perturbation
    branches instead of the raw normalized distance (1 column) — the
    reference's exact input layout (module.py:1423,1433: ``3 + n_phases +
    n_embed`` / ``6 + n_phases + n_embed``), required to transplant its
    shipped trained weights (Examples/travel_time_neural_network_*.h5)."""

    n_phases: int = 2
    n_hidden: int = 50
    n_embed: int = 10
    per_phase_base: bool = False

    def setup(self):
        h = self.n_hidden
        self.fc1 = [nn.Dense(h, name=f"fc1_{i}") for i in (1, 2, 3)]
        self.fc2 = [nn.Dense(h, name=f"fc2_{i}") for i in (1, 2, 3)]
        self.fc3 = [nn.Dense(h, name=f"fc3_{i}") for i in (1, 2, 3)]
        self.fc3_out = nn.Dense(self.n_embed, name="fc3_4")
        self.merge_1 = nn.Dense(self.n_hidden, name="merge_1")
        self.merge_act = PReLU()
        self.merge_2 = nn.Dense(self.n_phases, name="merge_2")
        self.vmodel = VModel(self.n_phases, self.n_hidden, self.n_embed)

    def embed_src(self, src_n):
        return self.fc3_out(_sin_block(src_n, *self.fc3))

    def _pred_norm(self, sta_n, src_n, embed, conversion_factor=None,
                   v_mean=None):
        """Normalized (base, perturbation) for broadcast-compatible inputs."""
        # safe norm: grad of sqrt at exactly 0 (sta == src, boundary loss)
        # would be NaN
        base = jnp.sqrt(((sta_n - src_n) ** 2).sum(-1, keepdims=True) + 1e-12)
        if self.per_phase_base:
            base = (conversion_factor * base
                    / v_mean.reshape((1,) * (base.ndim - 1) + (-1,)))
        p1 = _sin_block(jnp.concatenate((sta_n - src_n, base, embed), -1), *self.fc1)
        p2 = _sin_block(jnp.concatenate((sta_n, src_n, base, embed), -1), *self.fc2)
        pred = self.merge_2(self.merge_act(self.merge_1(jnp.concatenate((p1, p2), -1))))
        return base, pred

    def velocity(self, src_n, embed=None):
        if embed is None:
            embed = self.embed_src(src_n)
        return self.vmodel(src_n, embed)

    def time_norm(self, sta_n, src_n, conversion_factor, v_mean):
        """Normalized travel times (…, n_phases) before relu/denorm."""
        embed = self.embed_src(src_n)
        base, pred = self._pred_norm(sta_n, src_n, embed, conversion_factor,
                                     v_mean)
        if self.per_phase_base:
            return base + pred
        base_ph = conversion_factor * base / v_mean.reshape((1,) * (base.ndim - 1) + (-1,))
        return base_ph + pred

    def __call__(self, sta_n, src_n, conversion_factor, v_mean, t_scale):
        return jax.nn.relu(self.time_norm(sta_n, src_n, conversion_factor, v_mean) * t_scale)

    def init_all(self, sta_n, src_n, conversion_factor, v_mean, t_scale):
        """Touches every submodule (incl. the velocity net) so ``init``
        creates the full parameter tree."""
        t = self(sta_n, src_n, conversion_factor, v_mean, t_scale)
        v = self.velocity(src_n)
        return t, v


class TravelTimePN:
    """Bound surrogate implementing the framework ``trv`` contract
    (pairs + pairwise), wrapping params + scales."""

    def __init__(self, model: TravelTimesPN, params, scales: ScaleParams,
                 projection=None):
        self.model = model
        self.params = params
        self.scales = scales
        self.proj = projection

    def _norm(self, x):
        return (x - self.scales.center) / self.scales.x_scale

    def from_cart(self, sta_cart, src_cart):
        sta_n = self._norm(jnp.asarray(sta_cart))
        src_n = self._norm(jnp.asarray(src_cart))
        pairs_sta = jnp.broadcast_to(sta_n[None, :, :], (src_n.shape[0],) + sta_n.shape)
        pairs_src = jnp.broadcast_to(src_n[:, None, :], (src_n.shape[0], sta_n.shape[0], 3))
        return self.model.apply(
            self.params, pairs_sta, pairs_src,
            self.scales.conversion_factor, self.scales.v_mean, self.scales.t_scale)

    def __call__(self, sta_lla, src_lla):
        return self.from_cart(self.proj.to_cart(sta_lla), self.proj.to_cart(src_lla))

    def pairwise_from_cart(self, sta_cart, src_cart):
        sta_n = self._norm(jnp.asarray(sta_cart))
        src_n = self._norm(jnp.asarray(src_cart))
        return self.model.apply(
            self.params, sta_n, src_n,
            self.scales.conversion_factor, self.scales.v_mean, self.scales.t_scale)


def make_pinn_loss(model: TravelTimesPN, scales: ScaleParams, v_init_fn=None,
                   w_pde: float = 0.5, w_bound: float = 0.5, w_data: float = 1.0,
                   w_sign: float = 0.1, w_vdamp: float = 0.1):
    """Loss over a batch of (sta_n, src_n, t_obs_norm) samples.

    The eikonal residual is computed in *physical* units: with x = x_n·L and
    T = T_n·τ, ‖∇_x T‖ = (τ/L)·‖∇_{x_n} T_n‖ must equal 1/v.
    """
    cf = scales.conversion_factor
    L, tau = scales.x_scale, scales.t_scale

    def loss_fn(params, sta_n, src_n, t_obs_n, key=None):
        def t_one(s, x):
            return model.apply(params, s, x, cf, scales.v_mean, 1.0)

        t_pred_n = t_one(sta_n, src_n)                           # (B, n_ph)
        data = jnp.abs(t_pred_n - t_obs_n).mean()

        # Eikonal residual, entirely in normalized units: the velocity net
        # outputs v_n = v_phys·τ/L (O(1)), so ‖∇_{x_n} T_n‖ must equal 1/v_n.
        # Differentiate the pre-relu field (the PDE holds for the unclipped
        # solution; also avoids 0/0 in the norm where relu clamps to 0).
        def t_raw(s, x):
            return model.apply(params, s, x, cf, scales.v_mean,
                               method=TravelTimesPN.time_norm)
        grads = jax.vmap(jax.jacrev(lambda x, s: t_raw(s[None], x[None])[0],
                                    argnums=0))(src_n, sta_n)    # (B, n_ph, 3)
        grad_norm = jnp.sqrt((grads**2).sum(-1) + 1e-12)
        v_n = model.apply(params, src_n, None, method=TravelTimesPN.velocity)
        pde = jnp.abs(grad_norm - 1.0 / (v_n + 1e-3)).mean()

        # boundary: T(sta, sta) = 0
        bound = jnp.abs(t_one(sta_n, sta_n)).mean()

        # causality: pre-relu times should be positive
        raw = model.apply(params, sta_n, src_n, cf, scales.v_mean,
                          method=TravelTimesPN.time_norm)
        sign = jax.nn.relu(-raw).mean()

        vdamp = 0.0
        if v_init_fn is not None:
            v0 = v_init_fn(src_n)  # normalized: v_phys·τ/L
            vdamp = (jnp.abs(v_n - v0) / jnp.abs(v0)).mean()

        total = w_data * data + w_pde * pde + w_bound * bound + w_sign * sign + w_vdamp * vdamp
        return total, {"data": data, "pde": pde, "bound": bound, "sign": sign}

    return loss_fn


def train_pinn(key, model: TravelTimesPN, scales: ScaleParams, sample_fn,
               n_steps: int = 2000, batch: int = 4096, lr: float = 1e-3,
               v_init_fn=None, log_every: int = 0):
    """Adam training loop (ref: 150k steps × 30k batch on CUDA; here steps
    and batch are caller-chosen). ``sample_fn(key, n) -> (sta_n, src_n,
    t_obs_n)`` implements the importance sampling of ref :414-551."""
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)), jnp.zeros((1, 3)),
                        scales.conversion_factor, scales.v_mean, scales.t_scale,
                        method=TravelTimesPN.init_all)
    loss_fn = make_pinn_loss(model, scales, v_init_fn=v_init_fn)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, k):
        ks, kl = jax.random.split(k)
        sta_n, src_n, t_obs_n = sample_fn(ks, batch)
        (total, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, sta_n, src_n, t_obs_n, kl)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, total

    for i in range(n_steps):
        key, k = jax.random.split(key)
        params, opt_state, total = step(params, opt_state, k)
        if log_every and i % log_every == 0:
            print(f"pinn step {i}: loss {float(total):.5f}")
    return params


def importance_sample_volume(rng, Tp, Ts, origin, h, sta_cart_j, n,
                             mix=(0.3, 0.2, 0.2, 0.3), t_floor: float = 2.0,
                             near_sigma: float = 25e3):
    """Importance-sampled (src_cart, t_ps) training tuples from one station's
    FMM volume — the reference's sampling mixture for the PINN
    (calculate_travel_times_3D_train_model.py:414-551): uniform, 1/t, 1/t²
    (both emphasizing the steep near-field), and a near-station Gaussian ball
    (boundary-weighted). Uniform grid sampling alone under-fits near-station
    gradients — exactly where the σ_t-scale featurization lives.

    Returns ``(src_cart (n,3) f32, t (n,2) f32)``.
    """
    shape = np.asarray(Tp.shape)
    N = int(Tp.size)
    flat_tp = np.asarray(Tp, np.float32).reshape(-1)
    n_u = int(mix[0] * n)
    n_1 = int(mix[1] * n)
    n_2 = int(mix[2] * n)
    n_b = n - n_u - n_1 - n_2

    idx = [rng.integers(0, N, n_u)]
    w = 1.0 / np.maximum(flat_tp, t_floor)
    for power, count in ((1, n_1), (2, n_2)):
        cdf = np.cumsum(w if power == 1 else w * w)
        cdf /= cdf[-1]
        idx.append(np.searchsorted(cdf, rng.random(count)))
    # near-station Gaussian in index space (clipped to the volume)
    ctr = (np.asarray(sta_cart_j) - np.asarray(origin)) / h
    ijk = np.clip(np.round(ctr + rng.normal(0, near_sigma / h, (n_b, 3))),
                  0, shape - 1).astype(np.int64)
    idx.append(np.ravel_multi_index(
        (ijk[:, 0], ijk[:, 1], ijk[:, 2]), tuple(shape)))
    idx = np.concatenate(idx)
    iii = np.stack(np.unravel_index(idx, tuple(shape)), axis=1)
    src = (np.asarray(origin) + iii * h).astype(np.float32)
    t = np.stack((flat_tp[idx], np.asarray(Ts, np.float32).reshape(-1)[idx]),
                 axis=1)
    return src, t


def velocity_r2(model: TravelTimesPN, params, scales: ScaleParams, src_n,
                v_true_phys):
    """R² of the recovered velocity field vs truth — the reference's
    train/validation velocity-recovery check
    (calculate_travel_times_3D_train_model.py:1073-1246).

    src_n: (n, 3) normalized sample positions; v_true_phys: (n, n_phases) m/s.
    """
    v_n = model.apply(params, jnp.asarray(src_n), None,
                      method=TravelTimesPN.velocity)
    v_phys = np.asarray(v_n) * float(scales.conversion_factor)
    v_true = np.asarray(v_true_phys)
    ss_res = ((v_phys - v_true) ** 2).sum(axis=0)
    ss_tot = ((v_true - v_true.mean(axis=0)) ** 2).sum(axis=0) + 1e-12
    return 1.0 - ss_res / ss_tot


def scales_from_domain(center, x_scale, t_scale, v_mean) -> ScaleParams:
    return ScaleParams(
        center=jnp.asarray(center, jnp.float32),
        x_scale=jnp.asarray(x_scale, jnp.float32),
        t_scale=jnp.asarray(t_scale, jnp.float32),
        v_mean=jnp.asarray(v_mean, jnp.float32),
    )


def load_reference_pinn(weights_path, scale_params, v_mean):
    """Transplant the reference's shipped trained PINN (a torch state_dict,
    e.g. ``Examples/travel_time_neural_network_physics_informed_p_s_ver_1.h5``)
    into the JAX ``TravelTimesPN`` and return ``(model, params, scales)``.

    ``scale_params`` is the reference's 6-vector ``[max_dist, max_time,
    vp_max, vs_min, scale_norm_factor, conversion_factor]`` (saved alongside
    in the ``*_losses_*.npz``, ref train_model.py:680). The reference's
    normalization is uncentred (``norm_pos = x/max_dist``, :664) and its
    per-phase baseline ``conversion_factor·‖Δx_n‖/v̄_n`` equals ours with
    ``center=0, x_scale=max_dist, t_scale=max_time`` and raw ``v_mean``
    (both reduce to ``‖Δx‖/(max_time·v̄)``), so only the weights and the
    ``per_phase_base`` input layout need transplanting.

    torch is used only to deserialize the pickle; no torch runtime is kept.
    """
    import torch

    sd = {k: np.asarray(v.detach().cpu().numpy(), np.float32)
          for k, v in torch.load(weights_path, map_location="cpu",
                                 weights_only=False).items()}

    def dense(prefix):
        return {"kernel": jnp.asarray(sd[prefix + ".weight"].T),
                "bias": jnp.asarray(sd[prefix + ".bias"])}

    n_phases = sd["merge.2.weight"].shape[0]
    params = {"params": {
        **{f"fc{b}_{i}": dense(f"fc{b}_{i}") for b in (1, 2, 3) for i in (1, 2, 3)},
        "fc3_4": dense("fc3_4"),
        "merge_1": dense("merge.0"),
        "merge_act": {"a": jnp.asarray(sd["merge.1.weight"].reshape(()))},
        "merge_2": dense("merge.2"),
        "vmodel": {
            **{f"fc1_{i}": dense(f"vmodel.fc1_{i}") for i in (1, 2, 3)},
            **{f"fc1_4_{j}": dense(f"vmodel.fc1_4.{j}") for j in range(n_phases)},
        },
    }}
    max_dist, max_time = float(scale_params[0]), float(scale_params[1])
    scales = scales_from_domain(np.zeros(3), max_dist, max_time, v_mean)
    model = TravelTimesPN(n_phases=n_phases, n_hidden=sd["fc1_1.weight"].shape[0],
                          n_embed=sd["fc3_4.weight"].shape[0], per_phase_base=True)
    return model, params, scales
