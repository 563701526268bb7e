import numpy as np

from genie_tpu.native.fmm import fast_march, travel_time_volume


def test_fmm_homogeneous_matches_analytic():
    n = 41
    h = 500.0
    v = np.full((n, n, n), 5000.0, np.float32)
    src = np.array([n // 2 * h, n // 2 * h, n // 2 * h])
    T = fast_march(v, h, src[None])
    xs = np.arange(n) * h
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    d = np.sqrt((X - src[0]) ** 2 + (Y - src[1]) ** 2 + (Z - src[2]) ** 2)
    want = d / 5000.0
    err = np.abs(T - want)
    # first-order FMM: a few % of travel time away from the source
    far = d > 5 * h
    assert np.median(err[far] / want[far]) < 0.03
    assert T[n // 2, n // 2, n // 2] < 1e-3


def test_fmm_refraction_faster_than_straight_ray():
    # two-layer medium: deep layer is much faster → head waves arrive earlier
    # than the straight-ray time through the slow layer
    nx, ny, nz = 81, 5, 41
    h = 250.0
    v = np.full((nx, ny, nz), 2000.0, np.float32)
    v[:, :, :20] = 6000.0  # deep fast layer (z index 0 = deepest)
    src = np.array([0.0, 2 * h, 30 * h])  # in slow layer
    T = fast_march(v, h, src[None])
    # receiver far along x in the slow layer
    rec = (80, 2, 30)
    straight = np.linalg.norm(np.array(rec) * h - src) / 2000.0
    assert T[rec] < straight * 0.9


def test_travel_time_volume_1d_profile():
    depths = np.array([-10000.0, 0.0])
    vp = np.array([6000.0, 4000.0])
    T = travel_time_volume(depths, vp, (21, 21, 21), 500.0,
                           np.array([5000.0, 5000.0, -5000.0]),
                           origin=np.array([0.0, 0.0, -10000.0]))
    assert T.shape == (21, 21, 21)
    assert np.isfinite(T).all()
    # station node is ~0
    assert T[10, 10, 10] < 1e-3
