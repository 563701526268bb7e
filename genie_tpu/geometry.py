"""Geodetic coordinate transforms and the local Cartesian projection.

Mirrors the capabilities of the reference ``Code/utils.py:42-156``
(``lla2ecef``/``ecef2lla`` WGS84 transforms, Euler-angle rotation matrices,
and the fitted per-project projection closures ``ftrns1``/``ftrns2`` of
``train_GENIE_model.py:232-248``) — re-designed for JAX:

  * one implementation, traceable & differentiable (``jax.numpy``), usable
    on host (numpy arrays in, float64 when x64 enabled) and on device;
  * the projection is a closed-form local ENU (east-north-up) frame at the
    region centre rather than the reference's differential-evolution fit of
    three Euler angles (``assemble_network_data.py:9-52``): the ENU frame is
    exactly the optimum the reference's fit approaches (+lon→+x, +lat→+y,
    +depth→+z, centred), is deterministic, and needs no optimizer.

All positions are ``(..., 3)`` arrays of (lat deg, lon deg, depth m;
positive above sea level).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

WGS84_A = 6378137.0
WGS84_E = 8.18191908426215e-2
SPHERICAL_RADIUS = 6371e3


def lla2ecef(p, a: float = WGS84_A, e: float = WGS84_E):
    """Geodetic (lat deg, lon deg, alt m) → ECEF (m). Ref: utils.py:42-51."""
    p = jnp.asarray(p)
    lat = p[..., 0] * (jnp.pi / 180.0)
    lon = p[..., 1] * (jnp.pi / 180.0)
    alt = p[..., 2]
    n = a / jnp.sqrt(1.0 - (e**2) * jnp.sin(lat) ** 2)
    x = (n + alt) * jnp.cos(lat) * jnp.cos(lon)
    y = (n + alt) * jnp.cos(lat) * jnp.sin(lon)
    z = ((1.0 - e**2) * n + alt) * jnp.sin(lat)
    return jnp.stack((x, y, z), axis=-1)


def ecef2lla(x, a: float = WGS84_A, e: float = WGS84_E):
    """ECEF (m) → geodetic (lat deg, lon deg, alt m). Ref: utils.py:53-67.

    Closed-form (Bowring-style) inverse; matches the reference's algorithm
    including the near-axis altitude fix-up, expressed with ``where`` instead
    of boolean indexing so it stays jittable.
    """
    x = jnp.asarray(x)
    b = jnp.sqrt((a**2) * (1.0 - e**2))
    ep = jnp.sqrt((a**2 - b**2) / (b**2))
    p = jnp.sqrt(x[..., 0] ** 2 + x[..., 1] ** 2)
    th = jnp.arctan2(a * x[..., 2], b * p)
    lon = jnp.arctan2(x[..., 1], x[..., 0])
    lat = jnp.arctan2(
        x[..., 2] + (ep**2) * b * jnp.sin(th) ** 3,
        p - (e**2) * a * jnp.cos(th) ** 3,
    )
    n = a / jnp.sqrt(1.0 - (e**2) * jnp.sin(lat) ** 2)
    alt = p / jnp.cos(lat) - n
    near_axis = (jnp.abs(x[..., 0]) < 1.0) & (jnp.abs(x[..., 1]) < 1.0)
    alt = jnp.where(near_axis, jnp.abs(x[..., 2]) - b, alt)
    return jnp.stack(
        (lat * (180.0 / jnp.pi), lon * (180.0 / jnp.pi), alt), axis=-1
    )


def lla2ecef_np(p, a: float = WGS84_A, e: float = WGS84_E):
    """Float64 host twin of :func:`lla2ecef` (the reference keeps numpy
    float64 host versions alongside torch float32 device ones)."""
    p = np.asarray(p, dtype=np.float64)
    lat = np.deg2rad(p[..., 0])
    lon = np.deg2rad(p[..., 1])
    alt = p[..., 2]
    n = a / np.sqrt(1.0 - (e**2) * np.sin(lat) ** 2)
    x = (n + alt) * np.cos(lat) * np.cos(lon)
    y = (n + alt) * np.cos(lat) * np.sin(lon)
    z = ((1.0 - e**2) * n + alt) * np.sin(lat)
    return np.stack((x, y, z), axis=-1)


def ecef2lla_np(x, a: float = WGS84_A, e: float = WGS84_E):
    """Float64 host twin of :func:`ecef2lla`."""
    x = np.asarray(x, dtype=np.float64)
    b = np.sqrt((a**2) * (1.0 - e**2))
    ep = np.sqrt((a**2 - b**2) / (b**2))
    p = np.sqrt(x[..., 0] ** 2 + x[..., 1] ** 2)
    th = np.arctan2(a * x[..., 2], b * p)
    lon = np.arctan2(x[..., 1], x[..., 0])
    lat = np.arctan2(
        x[..., 2] + (ep**2) * b * np.sin(th) ** 3,
        p - (e**2) * a * np.cos(th) ** 3,
    )
    n = a / np.sqrt(1.0 - (e**2) * np.sin(lat) ** 2)
    alt = p / np.cos(lat) - n
    near_axis = (np.abs(x[..., 0]) < 1.0) & (np.abs(x[..., 1]) < 1.0)
    alt = np.where(near_axis, np.abs(x[..., 2]) - b, alt)
    return np.stack((np.rad2deg(lat), np.rad2deg(lon), alt), axis=-1)


def rotation_matrix(a, b, c):
    """Euler-angle (z-y-x intrinsic) 3×3 rotation. Ref: utils.py:120-156."""
    sa, ca = jnp.sin(a), jnp.cos(a)
    sb, cb = jnp.sin(b), jnp.cos(b)
    sc, cc = jnp.sin(c), jnp.cos(c)
    return jnp.array(
        [
            [cb * cc, sa * sb * cc - ca * sc, ca * sb * cc + sa * sc],
            [cb * sc, sa * sb * sc + ca * cc, ca * sb * sc - sa * cc],
            [-sb, sa * cb, ca * cb],
        ]
    )


def fit_projection(center_latlon, spherical: bool = False):
    """Build the local Cartesian projection for a region.

    Returns ``(rbest, mn)``: a 3×3 rotation and a 3-vector offset such that
    ``project = rbest @ (lla2ecef(x) - mn)`` maps the region centre to the
    origin with +x≈east, +y≈north, +z≈up (so '+depth' means shallower, as in
    the reference convention, ref ``assemble_network_data.py:9-52``).

    Closed form: rows of ``rbest`` are the ENU unit vectors at the centre.
    """
    lat0 = float(center_latlon[0]) * np.pi / 180.0
    lon0 = float(center_latlon[1]) * np.pi / 180.0
    east = np.array([-np.sin(lon0), np.cos(lon0), 0.0])
    north = np.array(
        [-np.sin(lat0) * np.cos(lon0), -np.sin(lat0) * np.sin(lon0), np.cos(lat0)]
    )
    up = np.array(
        [np.cos(lat0) * np.cos(lon0), np.cos(lat0) * np.sin(lon0), np.sin(lat0)]
    )
    rbest = np.stack((east, north, up), axis=0)
    if spherical:
        mn = np.asarray(
            lla2ecef(
                np.array([[center_latlon[0], center_latlon[1], 0.0]]),
                a=SPHERICAL_RADIUS,
                e=0.0,
            )
        )[0]
    else:
        mn = np.asarray(
            lla2ecef(np.array([[center_latlon[0], center_latlon[1], 0.0]]))
        )[0]
    return rbest, mn


class Projection:
    """The pair of projection closures (``ftrns1``/``ftrns2`` in the
    reference, ``train_GENIE_model.py:232-248``), jit/grad-compatible.

    ``to_cart`` : (lat, lon, depth) → local Cartesian metres
    ``to_lla``  : local Cartesian metres → (lat, lon, depth)
    """

    def __init__(self, rbest, mn, spherical: bool = False):
        self.rbest = jnp.asarray(rbest, dtype=jnp.float32)
        self.mn = jnp.asarray(mn, dtype=jnp.float32)
        self.spherical = spherical
        self._a = SPHERICAL_RADIUS if spherical else WGS84_A
        self._e = 0.0 if spherical else WGS84_E

    @classmethod
    def from_center(cls, center_latlon, spherical: bool = False):
        rbest, mn = fit_projection(center_latlon, spherical=spherical)
        return cls(rbest, mn, spherical=spherical)

    def to_cart(self, x):
        ecef = lla2ecef(x, a=self._a, e=self._e)
        return (ecef - self.mn) @ self.rbest.T

    def to_lla(self, x):
        ecef = jnp.asarray(x) @ self.rbest + self.mn
        return ecef2lla(ecef, a=self._a, e=self._e)

    def to_cart_np(self, x):
        """Float64 host-side projection (metre-accurate)."""
        ecef = lla2ecef_np(x, a=self._a, e=self._e)
        return (ecef - np.asarray(self.mn, np.float64)) @ np.asarray(self.rbest, np.float64).T

    def to_lla_np(self, x):
        ecef = np.asarray(x, np.float64) @ np.asarray(self.rbest, np.float64) + np.asarray(self.mn, np.float64)
        return ecef2lla_np(ecef, a=self._a, e=self._e)

    # Aliases matching the reference naming, for discoverability.
    def ftrns1(self, x):
        return self.to_cart(x)

    def ftrns2(self, x):
        return self.to_lla(x)
