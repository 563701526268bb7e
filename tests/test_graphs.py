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


def test_kmeans_packing_with_density():
    """Density-weighted packing concentrates nodes near the KDE support
    (ref utils.py:240-301)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from genie_tpu.graphs.build import (gaussian_kde_sampler,
                                        kmeans_packing_with_density)

    scale = np.array([2.0, 2.0, 30e3])
    offset = np.array([39.0, -124.0, -30e3])
    # tight event cluster at the box center
    ev = np.stack((np.full(50, 40.0), np.full(50, -123.0)), 1)
    ev += np.random.default_rng(0).normal(0, 0.03, ev.shape)
    sampler = gaussian_kde_sampler(ev, bandwidth=0.03)

    def to_cart(x):
        return jnp.stack((x[..., 1] * 90e3, x[..., 0] * 111e3, x[..., 2]), -1)

    v = kmeans_packing_with_density(
        jax.random.PRNGKey(0), sampler, scale, offset, 200, to_cart,
        frac=0.75, n_steps=120, n_batch=500)
    v = np.asarray(v)
    assert v.shape == (200, 3)
    d = np.hypot(v[:, 0] - 40.0, v[:, 1] + 123.0)
    # most nodes pulled into the cluster, but background coverage remains
    assert (d < 0.2).mean() > 0.4
    assert (d > 0.5).sum() > 5
    assert np.all((v[:, 2] >= -31e3) & (v[:, 2] <= 1e3))


def test_kmeans_packing_spherical():
    """Spherical packing: global lat/lon coverage + beta-biased shallow
    depths (ref utils.py:342-430)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from genie_tpu.geometry import lla2ecef
    from genie_tpu.graphs.build import kmeans_packing_spherical

    scale = np.array([0.0, 0.0, 100e3])
    offset = np.array([0.0, 0.0, -100e3])

    def to_cart(x):
        return lla2ecef(jnp.concatenate(
            (x[..., :2], jnp.zeros_like(x[..., 2:])), -1)) / 6371e3 \
            + jnp.concatenate((jnp.zeros_like(x[..., :2]), x[..., 2:]), -1) / 100e3

    v = np.asarray(kmeans_packing_spherical(
        jax.random.PRNGKey(1), scale, offset, 300, to_cart,
        n_steps=60, n_batch=600))
    assert v.shape == (300, 3)
    assert np.all(np.abs(v[:, 0]) <= 90.5) and np.all(np.abs(v[:, 1]) <= 180.5)
    # both hemispheres covered
    assert (v[:, 0] > 20).sum() > 30 and (v[:, 0] < -20).sum() > 30
    # beta shallow bias: median depth well above the uniform midpoint
    assert np.median(v[:, 2]) > -50e3
    assert np.all((v[:, 2] >= -101e3) & (v[:, 2] <= 1e3))
