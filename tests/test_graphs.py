import numpy as np
import jax
import jax.numpy as jnp

from genie_tpu.geometry import Projection
from genie_tpu.graphs.build import (
    build_pair_table,
    build_query_attachment,
    build_station_graph,
    build_time_pointers,
    kmeans_packing,
)


def test_time_pointers_match_naive():
    rng = np.random.default_rng(0)
    n_src, n_sta = 40, 7
    trv = rng.uniform(2, 50, size=(n_src, n_sta, 2)).astype(np.float32)
    ptr_p, ptr_s, dt0, dt, n_dt = build_time_pointers(trv, dt=1.0, k=5, win=10.0)
    assert ptr_p.shape == (n_sta, n_dt, 5)
    bins = dt0 + dt * np.arange(n_dt)
    for s in range(0, n_sta, 3):
        for b in range(0, n_dt, 7):
            d = np.abs(trv[:, s, 0] - bins[b])
            want = set(np.sort(np.argsort(d)[:5]).tolist())
            got = set(np.asarray(ptr_p[s, b]).tolist())
            # compare by distance (ties may differ)
            got_d = np.sort(d[list(got)])
            want_d = np.sort(d[list(want)])
            assert np.allclose(got_d, want_d, atol=1e-5)


def test_pair_table_semantics():
    tpick = jnp.asarray([0.0, 1.0, 2.0, 50.0, 3.0, 0.0])
    ipick = jnp.asarray([0, 0, 0, 0, 1, 1])
    mask = jnp.asarray([True, True, True, True, True, False])
    pair_idx, pair_valid = build_pair_table(tpick, ipick, mask, k_pair=3)
    pi = np.asarray(pair_idx)
    pv = np.asarray(pair_valid)
    n = 6
    # last column is always the null arrival
    assert (pi[:, -1] == n).all()
    # pick 0 (sta 0): self first, then picks 1, 2 (nearest in time)
    assert pi[0, 0] == 0 and set(pi[0, 1:3]) == {1, 2}
    # pick 4 (sta 1): only itself is valid on that station
    assert pi[4, 0] == 4 and pv[4, 0]
    assert not pv[4, 1] and not pv[4, 2]
    # masked pick 5 never appears in anyone's pair list
    assert not np.any(pi[:, :-1][pv[:, :-1]] == 5)


def test_query_attachment_and_station_graph():
    rng = np.random.default_rng(1)
    sta = rng.normal(size=(30, 3)).astype(np.float32) * 1e4
    nbr, valid = build_station_graph(sta, 4)
    assert nbr.shape == (30, 4) and np.asarray(valid).all()
    q = rng.normal(size=(11, 3)).astype(np.float32) * 1e4
    idx = build_query_attachment(sta, q, k=5)
    assert idx.shape == (11, 5)


def test_kmeans_packing_covers_domain():
    proj = Projection.from_center((40.0, -124.0))
    scale = np.array([1.9, 2.0, 42e3])
    offset = np.array([39.3, -125.0, -40e3])
    v = kmeans_packing(
        jax.random.PRNGKey(0), scale, offset, 50, proj.to_cart,
        n_batch=500, n_steps=100,
    )
    v = np.asarray(v)
    assert v.shape == (50, 3)
    # nodes stay in (near) the domain and spread over it
    assert v[:, 0].min() > 39.0 and v[:, 0].max() < 41.5
    assert v[:, 0].std() > 0.3 and v[:, 1].std() > 0.3
