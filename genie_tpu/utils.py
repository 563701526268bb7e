"""Assorted utilities mirroring the reference's ``Code/utils.py`` leftovers.

  * :func:`in_hull` — Delaunay membership test (utils.py:717-729);
  * :func:`select_stations_within_pick_budget` — replaces the cvxpy ILP
    ``optimize_station_selection`` (utils.py:645-667): choose the maximum
    number of stations such that their total pick count stays under a cap.
    Greedy-by-ascending-count is *exact* for maximizing the station count,
    so no ILP solver is needed;
  * :func:`compute_travel_times_chunked` — bounded-memory evaluation of a
    travel-time callable over many (station × source) pairs (utils.py:669-693).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def in_hull(points, hull_points):
    """True for points inside the convex hull of ``hull_points``."""
    from scipy.spatial import Delaunay

    tri = Delaunay(np.asarray(hull_points))
    return tri.find_simplex(np.asarray(points)) >= 0


def hull_halfspaces(hull_points):
    """Half-space form (A, b) of the convex hull of ``hull_points``:
    x is inside iff ``A @ x + b <= 0`` for all rows. The jittable
    counterpart of :func:`in_hull` — precompute on host, test on device
    (used by the PSO locator's hull projection, ref
    process_utils.py:1415-1422)."""
    from scipy.spatial import ConvexHull

    eq = ConvexHull(np.asarray(hull_points)).equations  # (n_facets, d+1)
    return eq[:, :-1].copy(), eq[:, -1].copy()


def select_stations_within_pick_budget(pick_counts, max_picks: int):
    """Indices of the largest station subset with Σ picks ≤ max_picks.

    Greedy ascending-by-count is optimal for maximizing subset size under a
    sum constraint (exchange argument), matching the reference ILP's optimum
    (utils.py:645-667, used to cap association labels during training,
    train_GENIE_model.py:1732-1754).
    """
    counts = np.asarray(pick_counts)
    order = np.argsort(counts)
    csum = np.cumsum(counts[order])
    n_keep = int(np.searchsorted(csum, max_picks, side="right"))
    return np.sort(order[:n_keep])


def compute_travel_times_chunked(trv_from_cart, sta_cart, src_cart,
                                 max_chunk: int = 50_000):
    """Evaluate trv over a large source set in chunks bounding peak memory
    (ref n_max_chunks=50e3)."""
    n_sta = sta_cart.shape[0]
    rows_per_chunk = max(1, max_chunk // max(n_sta, 1))
    outs = []
    for i in range(0, src_cart.shape[0], rows_per_chunk):
        outs.append(np.asarray(trv_from_cart(sta_cart, src_cart[i:i + rows_per_chunk])))
    return np.concatenate(outs, axis=0)
