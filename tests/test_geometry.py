import numpy as np
import jax

from genie_tpu.geometry import (
    Projection,
    ecef2lla,
    fit_projection,
    lla2ecef,
)


def _numpy_lla2ecef(p, a=6378137.0, e=8.18191908426215e-2):
    # Independent float64 host implementation of the WGS84 forward transform
    # (same formulas as reference utils.py:42-51) used as oracle.
    p = np.asarray(p, dtype=np.float64)
    lat = np.deg2rad(p[:, 0])
    lon = np.deg2rad(p[:, 1])
    n = a / np.sqrt(1 - (e**2) * np.sin(lat) ** 2)
    x = (n + p[:, 2]) * np.cos(lat) * np.cos(lon)
    y = (n + p[:, 2]) * np.cos(lat) * np.sin(lon)
    z = ((1 - e**2) * n + p[:, 2]) * np.sin(lat)
    return np.stack((x, y, z), axis=1)


def test_lla2ecef_matches_oracle():
    rng = np.random.default_rng(0)
    p = np.stack(
        (
            rng.uniform(-80, 80, 100),
            rng.uniform(-180, 180, 100),
            rng.uniform(-50e3, 5e3, 100),
        ),
        axis=1,
    )
    got = np.asarray(lla2ecef(p))
    want = _numpy_lla2ecef(p)
    # float32 on ~6.4e6 m magnitudes → metre-level agreement
    assert np.max(np.abs(got - want)) < 5.0


def test_roundtrip_lla_ecef():
    rng = np.random.default_rng(1)
    p = np.stack(
        (
            rng.uniform(30, 50, 200),
            rng.uniform(-130, -110, 200),
            rng.uniform(-40e3, 2e3, 200),
        ),
        axis=1,
    )
    back = np.asarray(ecef2lla(lla2ecef(p)))
    assert np.max(np.abs(back[:, 0] - p[:, 0])) < 1e-3  # deg
    assert np.max(np.abs(back[:, 1] - p[:, 1])) < 1e-3
    assert np.max(np.abs(back[:, 2] - p[:, 2])) < 20.0  # m


def test_projection_orientation():
    proj = Projection.from_center((40.0, -124.0))
    # centre maps to ~origin
    c = np.asarray(proj.to_cart(np.array([[40.0, -124.0, 0.0]])))
    assert np.all(np.abs(c) < 1.0)
    # +lat → +y, +lon → +x, +alt → +z (the reference's fitted convention)
    dlat = np.asarray(proj.to_cart(np.array([[40.01, -124.0, 0.0]])))[0]
    dlon = np.asarray(proj.to_cart(np.array([[40.0, -123.99, 0.0]])))[0]
    dup = np.asarray(proj.to_cart(np.array([[40.0, -124.0, 1000.0]])))[0]
    assert dlat[1] > 1000 and abs(dlat[0]) < 0.05 * dlat[1]
    assert dlon[0] > 800 and abs(dlon[1]) < 0.05 * dlon[0]
    assert dup[2] > 990 and abs(dup[0]) < 20 and abs(dup[1]) < 20


def test_projection_roundtrip_and_jit():
    proj = Projection.from_center((40.0, -124.0))
    rng = np.random.default_rng(2)
    p = np.stack(
        (
            rng.uniform(39.3, 41.2, 50),
            rng.uniform(-125.0, -123.0, 50),
            rng.uniform(-40e3, 2e3, 50),
        ),
        axis=1,
    ).astype(np.float32)
    # float32 device path: ECEF magnitudes ~6.4e6 m make this ~500 m accurate
    # (the reference's torch float32 ecef2lla_diff has the same behaviour).
    back = np.asarray(jax.jit(lambda x: proj.to_lla(proj.to_cart(x)))(p))
    assert np.max(np.abs(back[:, :2] - p[:, :2])) < 1e-2
    assert np.max(np.abs(back[:, 2] - p[:, 2])) < 500.0
    # float64 host path is metre-accurate
    back64 = proj.to_lla_np(proj.to_cart_np(p.astype(np.float64)))
    assert np.max(np.abs(back64[:, :2] - p[:, :2])) < 1e-6
    assert np.max(np.abs(back64[:, 2] - p[:, 2])) < 1e-2


def test_projection_differentiable():
    proj = Projection.from_center((40.0, -124.0))
    f = lambda x: proj.to_cart(x).sum()
    g = jax.grad(f)(np.array([[40.0, -124.0, 0.0]], dtype=np.float32))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0


def test_fit_projection_rotation_orthonormal():
    rbest, mn = fit_projection((40.0, -124.0))
    assert np.allclose(rbest @ rbest.T, np.eye(3), atol=1e-12)
