import numpy as np
import jax
import jax.numpy as jnp

from genie_tpu.geometry import Projection
from genie_tpu.models.travel_time import HomogeneousTravelTime
from genie_tpu.relocation.graphdd import (
    GNNLocation,
    build_catalog_data,
    make_relocation_graphs,
    relocate,
    train_graphdd,
)


def make_cluster(seed=0, n_ev=24, n_sta=14, noise_pos=4e3, noise_t=0.0):
    rng = np.random.default_rng(seed)
    proj = Projection.from_center((40.0, -124.0))
    tt = HomogeneousTravelTime(proj)
    sta = rng.uniform(-60e3, 60e3, (n_sta, 3)).astype(np.float32)
    sta[:, 2] = 0.0
    true_pos = (np.array([5e3, -8e3, -10e3]) +
                rng.normal(0, 2e3, (n_ev, 3))).astype(np.float32)
    true_t = rng.uniform(0, 1000, n_ev).astype(np.float32)
    trv = np.asarray(tt.from_cart(jnp.asarray(sta), jnp.asarray(true_pos)))
    obs = true_t[:, None, None] + trv
    mask = (rng.random((n_ev, n_sta, 2)) < 0.85).astype(np.float32)
    init_pos = (true_pos + rng.normal(0, noise_pos, (n_ev, 3))).astype(np.float32)
    init_t = (true_t + rng.normal(0, noise_t, n_ev)).astype(np.float32)
    return tt, sta, true_pos, true_t, init_pos, init_t, obs, mask


def test_build_catalog_data_partials():
    tt, sta, true_pos, true_t, init_pos, init_t, obs, mask = make_cluster()
    resid, partials = build_catalog_data(
        tt.from_cart, jnp.asarray(sta), jnp.asarray(true_pos),
        jnp.asarray(true_t), jnp.asarray(obs), jnp.asarray(mask))
    # residuals at true positions are 0 (picks are exact)
    assert np.abs(np.asarray(resid)).max() < 1e-3
    # partials magnitude ≈ slowness (1/v)
    pn = np.linalg.norm(np.asarray(partials)[:, :, 0, :], axis=-1)
    assert np.allclose(pn, 1 / 5500.0, rtol=0.01)


def test_graphdd_relocation_improves_locations():
    tt, sta, true_pos, true_t, init_pos, init_t, obs, mask = make_cluster()
    graphs = make_relocation_graphs(
        jax.random.PRNGKey(0), jnp.asarray(init_pos), jnp.asarray(init_t),
        jnp.asarray(obs), jnp.asarray(mask), jnp.asarray(sta),
        n_graphs=3, graph_size=24, k_src=6, k_sta=5, max_pair_dist=20e3)
    model = GNNLocation(n_rounds=3)
    params, loss = train_graphdd(
        jax.random.PRNGKey(1), model, tt.from_cart, jnp.asarray(sta), graphs,
        n_steps=1200, lr=3e-3)
    g = graphs[0]
    new_pos, new_t, sta_corr = relocate(model, params, tt.from_cart,
                                        jnp.asarray(sta), g)
    # map graph rows back to events: graph rows are a permutation of events
    # (graph_size == n_ev here); compare distance to truth before/after
    d_init = np.linalg.norm(np.asarray(g.src_pos) -
                            true_pos[np.argsort(np.argsort(init_t))][:len(g.src_pos)], axis=1)
    # simpler: find the true event for each graph row by matching init_pos
    rows = []
    for r in range(len(np.asarray(g.src_pos))):
        d = np.linalg.norm(init_pos - np.asarray(g.src_pos)[r], axis=1)
        rows.append(np.argmin(d))
    rows = np.array(rows)
    err_before = np.linalg.norm(np.asarray(g.src_pos) - true_pos[rows], axis=1)
    err_after = np.linalg.norm(np.asarray(new_pos) - true_pos[rows], axis=1)
    assert np.median(err_after) < 0.7 * np.median(err_before)
    assert np.isfinite(np.asarray(sta_corr)).all()


def test_graphdd_with_memory_input():
    tt, sta, true_pos, true_t, init_pos, init_t, obs, mask = make_cluster(seed=1)
    graphs = make_relocation_graphs(
        jax.random.PRNGKey(2), jnp.asarray(init_pos), jnp.asarray(init_t),
        jnp.asarray(obs), jnp.asarray(mask), jnp.asarray(sta),
        n_graphs=2, graph_size=24, k_src=6, k_sta=5, max_pair_dist=20e3)
    model = GNNLocation(n_rounds=2)
    params, loss = train_graphdd(
        jax.random.PRNGKey(3), model, tt.from_cart, jnp.asarray(sta), graphs,
        n_steps=60, lr=2e-3, use_memory=True)
    assert np.isfinite(loss)


def test_prune_and_isolation_helpers():
    from genie_tpu.relocation.graphdd import drop_isolated_sources, prune_picks
    resid = jnp.asarray([[[0.1, 5.0], [0.2, 0.1]]])
    mask = jnp.ones((1, 2, 2))
    out = np.asarray(prune_picks(resid, mask, max_resid=2.0))
    assert out[0, 0, 1] == 0 and out[0, 0, 0] == 1
    pos = jnp.asarray([[0., 0, 0], [1e3, 0, 0], [500e3, 0, 0]])
    smask = jnp.ones(3, bool)
    omask = jnp.ones((3, 4, 2))
    keep = np.asarray(drop_isolated_sources(pos, smask, omask, min_picks=2))
    assert keep[0] and keep[1] and not keep[2]  # far source isolated
