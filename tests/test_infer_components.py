import numpy as np
import jax
import jax.numpy as jnp

from genie_tpu.geometry import Projection
from genie_tpu.infer.assign import (
    competitive_assignment,
    competitive_assignment_split,
    maximize_bipartite_assignment,
)
from genie_tpu.infer.cluster import find_peaks_1d, local_marching, split_time_groups
from genie_tpu.infer.locate import locate_source, location_uncertainty
from genie_tpu.models.travel_time import HomogeneousTravelTime


def test_find_peaks():
    x = np.zeros(50)
    x[10] = 1.0
    x[12] = 0.8
    x[30] = 0.9
    idx = find_peaks_1d(x, thresh=0.5, min_spacing=5)
    assert 10 in idx and 30 in idx and 12 not in idx


def test_split_time_groups():
    t = np.array([0.0, 1.0, 2.0, 50.0, 51.0, 200.0])
    groups = split_time_groups(t, break_win=15.0)
    assert len(groups) == 3
    assert sorted(map(len, groups)) == [1, 2, 3]


def test_local_marching_merges_cluster():
    rng = np.random.default_rng(0)
    # two true events, each with a cloud of near-duplicate candidates
    c1 = np.array([0.0, 0.0, -5e3, 100.0])
    c2 = np.array([40e3, 10e3, -8e3, 160.0])
    cands, vals = [], []
    for c, v0 in ((c1, 1.0), (c2, 0.8)):
        for _ in range(10):
            p = c + np.concatenate((rng.normal(0, 2e3, 3), rng.normal(0, 1.0, 1)))
            cands.append(p)
            vals.append(v0 - abs(rng.normal(0, 0.1)))
    cands = np.array(cands)
    vals = np.array(vals)
    keep = local_marching(cands, vals, tc_win=10.0, sp_win=15e3)
    assert len(keep) == 2
    kept_t = np.sort(cands[keep, 3])
    assert abs(kept_t[0] - 100.0) < 5 and abs(kept_t[1] - 160.0) < 5


def test_competitive_assignment_two_sources():
    # 2 sources, 3 stations; each station has a P pick for each source
    n_arv, n_src = 6, 2
    ipick = np.array([0, 0, 1, 1, 2, 2])
    w = np.zeros((n_arv, n_src, 2))
    for i in range(3):
        w[2 * i, 0, 0] = 0.9       # even arrivals belong to source 0 (P)
        w[2 * i + 1, 1, 0] = 0.8   # odd arrivals to source 1 (P)
        w[2 * i, 1, 0] = 0.2       # weak cross weights
        w[2 * i + 1, 0, 0] = 0.1
    assign, active = competitive_assignment(w, ipick, cost=0.5)
    assert active.all()
    for i in range(3):
        assert tuple(assign[2 * i]) == (0, 0)
        assert tuple(assign[2 * i + 1]) == (1, 0)


def test_competitive_assignment_drops_weak_source():
    n_arv, n_src = 3, 2
    ipick = np.array([0, 1, 2])
    w = np.zeros((n_arv, n_src, 2))
    w[:, 0, 0] = 0.9   # source 0 strongly supported
    w[:, 1, 1] = 0.05  # source 1 barely supported, activation cost 0.5 > 0.15
    assign, active = competitive_assignment(w, ipick, cost=0.5)
    assert active[0] and not active[1]
    assert (assign[:, 0] == 0).all()


def test_station_capacity_constraint():
    # two arrivals at the SAME station both want (src 0, P): only one wins
    ipick = np.array([0, 0])
    w = np.zeros((2, 1, 2))
    w[0, 0, 0] = 0.9
    w[1, 0, 0] = 0.8
    assign, active = competitive_assignment(w, ipick, cost=0.1)
    assigned = [tuple(a) for a in assign if a[0] >= 0]
    assert assigned.count((0, 0)) == 1


def test_assignment_split_relaxed():
    ipick = np.array([0, 0])
    w = np.zeros((2, 1, 2))
    w[0, 0, 0] = 0.9
    w[1, 0, 0] = 0.8
    assign, active = competitive_assignment_split(w, ipick, cost=0.1)
    # relaxed: both can take (0, P)
    assert tuple(assign[0]) == (0, 0) and tuple(assign[1]) == (0, 0)


def test_bipartite_catalog_matching():
    a = np.array([[0, 0, -5e3, 10.0], [50e3, 0, -5e3, 100.0], [0, 80e3, -5e3, 200.0]])
    b = np.array([[1e3, 1e3, -6e3, 11.0], [49e3, 2e3, -4e3, 99.0]])
    ia, ib = maximize_bipartite_assignment(a, b)
    assert set(zip(ia.tolist(), ib.tolist())) == {(0, 0), (1, 1)}


def test_locate_source_recovers_planted_event():
    rng = np.random.default_rng(3)
    proj = Projection.from_center((40.0, -124.0))
    tt = HomogeneousTravelTime(proj)
    n_sta = 20
    sta = rng.uniform(-60e3, 60e3, (n_sta, 3)).astype(np.float32)
    sta[:, 2] = 0.0
    true_pos = np.array([12e3, -20e3, -9e3], np.float32)
    true_t0 = 4.0
    trv = np.asarray(tt.from_cart(jnp.asarray(sta), jnp.asarray(true_pos[None])))[0]
    # P picks at all stations, S at half
    tpick, ipick, phase = [], [], []
    for s in range(n_sta):
        tpick.append(true_t0 + trv[s, 0]); ipick.append(s); phase.append(0)
        if s % 2 == 0:
            tpick.append(true_t0 + trv[s, 1]); ipick.append(s); phase.append(1)
    tpick = jnp.asarray(np.array(tpick, np.float32))
    ipick = jnp.asarray(np.array(ipick, np.int32))
    phase = jnp.asarray(np.array(phase, np.float32)[:, None])
    mask = jnp.ones(len(tpick), bool)
    lo = np.array([-80e3, -80e3, -40e3, -10.0], np.float32)
    hi = np.array([80e3, 80e3, 2e3, 30.0], np.float32)
    pos, t0, cost = locate_source(
        jax.random.PRNGKey(0), tt.from_cart, jnp.asarray(sta), tpick, ipick,
        phase, mask, lo, hi, popsize=96, n_iter=120)
    assert np.linalg.norm(np.asarray(pos) - true_pos) < 3e3
    assert abs(float(t0) - true_t0) < 0.5
    cov = location_uncertainty(tt.from_cart, jnp.asarray(sta), pos, t0,
                               tpick, ipick, phase, mask)
    assert np.all(np.isfinite(np.asarray(cov)))
