import numpy as np
import jax
import jax.numpy as jnp


def test_merge_and_csv_catalog(tmp_path):
    from genie_tpu.calibration.magnitude_scale import (
        merge_daily_catalogs, write_csv_catalog)
    from genie_tpu.infer.pipeline import CatalogEvent
    from genie_tpu.io import save_catalog

    evs1 = [CatalogEvent(np.array([0.0, 0, -5e3]), 10.0, np.array([0]), np.array([0]), mag=2.0)]
    evs2 = [CatalogEvent(np.array([1e3, 0, -5e3]), 99.0, np.array([1]), np.array([1]))]
    save_catalog(tmp_path / "d1.hdf5", evs1)
    save_catalog(tmp_path / "d2.hdf5", evs2)
    merged = merge_daily_catalogs([tmp_path / "d1.hdf5", tmp_path / "d2.hdf5"],
                                  out_hdf5=tmp_path / "all.hdf5")
    assert len(merged) == 2
    write_csv_catalog(tmp_path / "cat.csv", merged)
    txt = (tmp_path / "cat.csv").read_text()
    assert txt.startswith("lat,lon") and len(txt.splitlines()) == 3


def test_magnitude_distance_model():
    from genie_tpu.calibration.magnitude_scale import fit_magnitude_distance_model

    rng = np.random.default_rng(0)
    mags = rng.uniform(0, 5, 500)
    dists = 20e3 * np.exp(0.5 * mags) * rng.uniform(0.3, 1.0, 500)
    f = fit_magnitude_distance_model(mags, dists)
    assert f(4.0) > f(1.0)  # monotone increasing
    assert np.isfinite(f(np.array([0.5, 2.5, 4.5]))).all()


def test_kmeans_fit_sources():
    from genie_tpu.graphs.build import kmeans_packing_fit_sources
    from genie_tpu.geometry import Projection

    proj = Projection.from_center((40.0, -124.0))
    rng = np.random.default_rng(1)
    ref = rng.normal(0, 5e3, (50, 3)).astype(np.float32) + np.array([20e3, -10e3, -8e3], np.float32)
    scale = np.array([1.9, 2.0, 42e3])
    offset = np.array([39.3, -125.0, -40e3])
    v = kmeans_packing_fit_sources(
        jax.random.PRNGKey(0), ref, scale, offset, 30, proj.to_cart,
        n_batch=300, n_steps=60)
    v = np.asarray(v)
    assert v.shape == (30, 3)
    # a good fraction of nodes concentrate near the reference cluster
    d = np.linalg.norm(v - np.array([20e3, -10e3, -8e3]), axis=1)
    assert (d < 40e3).sum() >= 10


def test_fibonacci_sphere():
    from genie_tpu.graphs.build import fibonacci_sphere_packing

    pts = fibonacci_sphere_packing(200)
    r = np.linalg.norm(pts, axis=1)
    assert np.allclose(r, 6371e3, rtol=1e-6)
    assert pts[:, 2].min() < -6e6 and pts[:, 2].max() > 6e6  # covers poles


def test_visualize_predictions(tmp_path):
    from genie_tpu.viz import visualize_predictions

    rng = np.random.default_rng(0)
    grid = rng.uniform(-50e3, 50e3, (100, 3))
    lbl = rng.random((100, 9)).astype(np.float32)
    out = visualize_predictions(tmp_path, 5, grid, lbl, lbl * 0.9,
                                x_query=grid[:50], lbl_query=lbl[:50],
                                pred_query=lbl[:50] * 0.8,
                                arv_p=rng.random((20, 30)))
    assert out.exists() and out.stat().st_size > 1000


def test_magnitude_distance_params_roundtrip_and_qc():
    """The picklable params form evaluates identically to the callable, and
    the pipeline's magnitude_distance_qc drops implausibly distant picks
    then re-applies the min picks/stations filter."""
    import pickle

    from genie_tpu.calibration.magnitude_scale import (
        eval_magnitude_distance, fit_magnitude_distance_params)

    rng = np.random.default_rng(1)
    mags = rng.uniform(0, 5, 400)
    dists = 20e3 * np.exp(0.5 * mags) * rng.uniform(0.3, 1.0, 400)
    params = fit_magnitude_distance_params(mags, dists)
    params = pickle.loads(pickle.dumps(params))
    assert eval_magnitude_distance(params, 4.0) > eval_magnitude_distance(params, 1.0)

    # QC via a minimal pipeline stand-in (no model needed for this stage)
    from genie_tpu.infer.pipeline import CatalogEvent, InferencePipeline

    class _Ctx:
        sta_cart = np.array([[0.0, 0, 0], [5e3, 0, 0], [400e3, 0, 0],
                             [1e3, 2e3, 0], [2e3, 1e3, 0]], np.float32)

    class _P:
        min_required_picks = 3
        min_required_sta = 3

    class _Cfg:
        process = _P()

    pipe = InferencePipeline.__new__(InferencePipeline)
    pipe.ctx = _Ctx()
    pipe.cfg = _Cfg()
    pipe.mag = {"dist_model": params}
    pick_sta = np.array([0, 1, 2, 3, 4])
    ev_ok = CatalogEvent(pos_cart=np.zeros(3), time=0.0,
                         picks=np.array([0, 1, 3, 4]),
                         pick_phases=np.array([0, 1, 0, 1]), mag=3.0)
    # the station-2 pick sits 400 km out: implausible for a small event
    ev_far = CatalogEvent(pos_cart=np.zeros(3), time=10.0,
                          picks=np.array([0, 1, 2]),
                          pick_phases=np.array([0, 0, 1]), mag=0.2)
    out = pipe.magnitude_distance_qc([ev_ok, ev_far], pick_sta)
    assert len(out) == 1 and out[0].time == 0.0  # far event fell below mins
    assert len(out[0].picks) == 4                 # nearby picks untouched


def test_plot_catalog_day(tmp_path):
    from genie_tpu.viz import plot_catalog_day

    rng = np.random.default_rng(0)
    det = rng.uniform(-50e3, 50e3, (12, 4)); det[:, 3] = rng.uniform(0, 86400, 12)
    usgs = rng.uniform(-50e3, 50e3, (8, 4)); usgs[:, 3] = rng.uniform(0, 86400, 8)
    p = plot_catalog_day(tmp_path / "day.png", det, usgs,
                         det_mags=rng.uniform(1, 4, 12),
                         usgs_mags=rng.uniform(1, 4, 8), title="test day")
    assert p.exists() and p.stat().st_size > 10_000


def test_gp_minimize_beats_random_search():
    """Native GP-EI minimizer (ref's disabled skopt flow, train_GENIE_model
    .py:1943-1951): on a smooth 4-d bowl with a shifted optimum it must land
    clearly closer to the minimum than the pure random half of its budget."""
    import numpy as np
    from genie_tpu.train.bayes_opt import gp_minimize

    opt = np.array([0.3, -0.6, 0.1, 0.8])

    def f(x):
        return float(((x - opt) ** 2).sum() + 0.3 * np.sin(3 * x).sum())

    bounds = [(-2.0, 2.0)] * 4
    x_best, y_best, X, Y = gp_minimize(f, bounds, n_calls=40,
                                       n_random_starts=12, seed=3)
    y_random = min(Y[:12])
    assert y_best < y_random - 1e-6       # the GP phase found better points
    assert y_best < 0.5 * y_random        # and not marginally


def test_pick_statistics_separate_clustered_from_uniform():
    """The sample_picks targets must distinguish spatio-temporally clustered
    picks (event-like) from uniform noise, and event-like synthetic stats
    must sit closer to event-like targets."""
    import numpy as np
    from genie_tpu.train.bayes_opt import pick_statistics, stats_residual

    rng = np.random.default_rng(0)
    n_sta = 24
    sta = rng.uniform(0, 200e3, (n_sta, 3))

    def clustered(seed):
        r = np.random.default_rng(seed)
        t, s = [], []
        for _ in range(40):                 # events: bursts on NEARBY stations
            t0 = r.uniform(0, 10000)
            root = r.integers(0, n_sta)
            d = np.linalg.norm(sta[:, :2] - sta[root, :2], axis=1)
            near = np.argsort(d)[:8]
            for j in near:
                t.append(t0 + r.uniform(0, 30))
                s.append(j)
        return np.asarray(t), np.asarray(s)

    def uniform(seed):
        r = np.random.default_rng(seed)
        n = 320
        return r.uniform(0, 10000, n), r.integers(0, n_sta, n)

    tc = pick_statistics(*clustered(1), sta, seed=1)
    tu = pick_statistics(*uniform(1), sta, seed=1)
    probe = pick_statistics(*clustered(2), sta, seed=2)
    assert stats_residual(probe, [tc]) < stats_residual(probe, [tu])
