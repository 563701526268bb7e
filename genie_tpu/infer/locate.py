"""Maximum-likelihood source location via vectorized differential evolution.

Replaces the reference's scipy ``differential_evolution`` locator
(process_utils.py:1211-1355, ``differential_evolution_location(_trim)``) with
a fully-batched JAX DE: the whole population (and optionally many sources at
once) is evaluated through the travel-time surrogate in one device call —
the reference already hints at this with ``vectorized=True``.

Objective (matching ``_trim``): robust L1-ish misfit of theoretical vs
observed arrivals over (position, origin-time), with the worst ``trim``
fraction of residuals dropped per candidate, optional phase weighting.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("popsize", "n_iter", "fn"))
def de_minimize(fn, bounds_lo, bounds_hi, key, popsize: int = 64, n_iter: int = 100,
                f_weight: float = 0.6, cr: float = 0.9):
    """Generic vectorized differential evolution (rand/1/bin).

    ``fn(x)`` maps (pop, d) → (pop,) costs; returns (x_best, cost_best).
    """
    d = bounds_lo.shape[0]
    k0, key = jax.random.split(key)
    pop = bounds_lo + (bounds_hi - bounds_lo) * jax.random.uniform(k0, (popsize, d))
    cost = fn(pop)

    def step(carry, k):
        pop, cost = carry
        ka, kb, kc, kr, km = jax.random.split(k, 5)
        a = jax.random.randint(ka, (popsize,), 0, popsize)
        b = jax.random.randint(kb, (popsize,), 0, popsize)
        c = jax.random.randint(kc, (popsize,), 0, popsize)
        mutant = pop[a] + f_weight * (pop[b] - pop[c])
        mutant = jnp.clip(mutant, bounds_lo, bounds_hi)
        cross = jax.random.uniform(kr, (popsize, d)) < cr
        # ensure at least one dim crosses
        j_rand = jax.random.randint(km, (popsize,), 0, d)
        cross = cross | (jnp.arange(d)[None, :] == j_rand[:, None])
        trial = jnp.where(cross, mutant, pop)
        c_trial = fn(trial)
        better = c_trial < cost
        pop = jnp.where(better[:, None], trial, pop)
        cost = jnp.where(better, c_trial, cost)
        return (pop, cost), None

    (pop, cost), _ = jax.lax.scan(step, (pop, cost), jax.random.split(key, n_iter))
    ib = jnp.argmin(cost)
    return pop[ib], cost[ib]


def make_location_objective(trv_from_cart, sta_cart, tpick, ipick, phase, pick_mask,
                            trim_fraction: float = 0.2, sig_t: float = 1.0):
    """Build the trimmed-residual objective for one source.

    tpick (n_pick,) window-relative; candidates x = (x, y, z, t0) Cartesian.
    """
    n_pick = tpick.shape[0]
    n_keep = n_pick - int(trim_fraction * n_pick)

    def objective(cand):
        # cand: (pop, 4)
        pos = cand[:, :3]
        t0 = cand[:, 3]
        trv = trv_from_cart(sta_cart, pos)                       # (pop, n_sta, 2)
        t_theory = trv[:, ipick, :]                              # (pop, n_pick, 2)
        ph = phase[:, 0].astype(jnp.int32)
        t_ph = jnp.take_along_axis(t_theory, ph[None, :, None], axis=2)[:, :, 0]
        res = jnp.abs(tpick[None, :] - (t_ph + t0[:, None])) / sig_t
        res = jnp.where(pick_mask[None, :], res, jnp.inf)
        # trim worst residuals (finite ones); inf (masked) sorts last
        res_sorted = jnp.sort(res, axis=1)
        res_kept = jnp.where(jnp.isfinite(res_sorted[:, :n_keep]),
                             res_sorted[:, :n_keep], 0.0)
        cnt = jnp.isfinite(res_sorted[:, :n_keep]).sum(axis=1)
        return res_kept.sum(axis=1) / jnp.maximum(cnt, 1)

    return objective


def locate_source(key, trv_from_cart, sta_cart, tpick, ipick, phase, pick_mask,
                  bounds_lo, bounds_hi, popsize: int = 128, n_iter: int = 150,
                  trim_fraction: float = 0.2):
    """DE-locate one source; returns (pos_cart (3,), t0, cost)."""
    obj = make_location_objective(trv_from_cart, sta_cart, tpick, ipick, phase,
                                  pick_mask, trim_fraction)
    x, c = de_minimize(obj, jnp.asarray(bounds_lo, jnp.float32),
                       jnp.asarray(bounds_hi, jnp.float32), key,
                       popsize=popsize, n_iter=n_iter)
    return x[:3], x[3], c


@partial(jax.jit, static_argnames=("popsize", "n_iter", "fn"))
def pso_minimize(fn, bounds_lo, bounds_hi, key, popsize: int = 64,
                 n_iter: int = 100, w: float = 0.7, c1: float = 1.5,
                 c2: float = 1.5):
    """Vectorized particle-swarm optimizer — the reference's alternative
    locator (``MLE_particle_swarm_location_with_hull``,
    process_utils.py:1358-1461), with bound clipping standing in for the
    convex-hull projection."""
    d = bounds_lo.shape[0]
    k0, k1, key = jax.random.split(key, 3)
    pos = bounds_lo + (bounds_hi - bounds_lo) * jax.random.uniform(k0, (popsize, d))
    vel = 0.1 * (bounds_hi - bounds_lo) * jax.random.normal(k1, (popsize, d))
    cost = fn(pos)
    pbest, pbest_c = pos, cost
    gbest = pos[jnp.argmin(cost)]
    gbest_c = cost.min()

    def step(carry, k):
        pos, vel, pbest, pbest_c, gbest, gbest_c = carry
        ka, kb = jax.random.split(k)
        r1 = jax.random.uniform(ka, pos.shape)
        r2 = jax.random.uniform(kb, pos.shape)
        vel = w * vel + c1 * r1 * (pbest - pos) + c2 * r2 * (gbest[None] - pos)
        pos = jnp.clip(pos + vel, bounds_lo, bounds_hi)
        cost = fn(pos)
        better = cost < pbest_c
        pbest = jnp.where(better[:, None], pos, pbest)
        pbest_c = jnp.where(better, cost, pbest_c)
        ib = jnp.argmin(pbest_c)
        return (pos, vel, pbest, pbest_c, pbest[ib], pbest_c[ib]), None

    (pos, vel, pbest, pbest_c, gbest, gbest_c), _ = jax.lax.scan(
        step, (pos, vel, pbest, pbest_c, gbest, gbest_c),
        jax.random.split(key, n_iter))
    return gbest, gbest_c


def locate_source_pso(key, trv_from_cart, sta_cart, tpick, ipick, phase,
                      pick_mask, bounds_lo, bounds_hi, popsize: int = 128,
                      n_iter: int = 120, trim_fraction: float = 0.2):
    obj = make_location_objective(trv_from_cart, sta_cart, tpick, ipick, phase,
                                  pick_mask, trim_fraction)
    x, c = pso_minimize(obj, jnp.asarray(bounds_lo, jnp.float32),
                        jnp.asarray(bounds_hi, jnp.float32), key,
                        popsize=popsize, n_iter=n_iter)
    return x[:3], x[3], c


def location_uncertainty(trv_from_cart, sta_cart, pos, t0, tpick, ipick, phase,
                         pick_mask, sig_t: float = 1.0):
    """Gauss-Newton covariance of the located source from travel-time
    partials (the reference's autograd ``srcs_sigma``,
    process_continuous_days.py:1576-1960). Returns (4,4) covariance."""
    def resid(x):
        trv = trv_from_cart(sta_cart, x[None, :3])[0]            # (n_sta, 2)
        ph = phase[:, 0].astype(jnp.int32)
        t_ph = trv[ipick, :]
        t_ph = jnp.take_along_axis(t_ph, ph[:, None], axis=1)[:, 0]
        return (tpick - (t_ph + x[3])) / sig_t

    x = jnp.concatenate((pos, jnp.asarray([t0])))
    J = jax.jacfwd(resid)(x)                                     # (n_pick, 4)
    J = J * pick_mask[:, None]
    JtJ = J.T @ J
    return jnp.linalg.pinv(JtJ + 1e-8 * jnp.eye(4))
