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


def test_local_marching_keeps_chained_local_maxima():
    """A transitive chain A-B-C-D-E (each within the ε-ball of the next only)
    with two local maxima B and D must keep BOTH — the reference's directed
    max-flooding keeps every local max, not one per connected component
    (process_utils.py:70-100)."""
    # positions identical; times 0,4,8,12,16 with tc_win=5 → only adjacent
    # candidates are neighbours, but the chain is one connected component
    cands = np.array([[0.0, 0.0, 0.0, 4.0 * i] for i in range(5)])
    vals = np.array([0.5, 0.9, 0.4, 0.8, 0.3])
    keep = local_marching(cands, vals, tc_win=5.0, sp_win=15e3)
    assert sorted(keep.tolist()) == [1, 3]


def test_local_marching_single_and_empty():
    assert local_marching(np.zeros((0, 4)), np.zeros(0)).size == 0
    assert local_marching(np.zeros((1, 4)), np.ones(1)).tolist() == [0]


def _local_marching_dense(cands, values, tc_win, sp_win, depth_weight=1.0,
                          n_steps=100, tol=1e-12):
    """Brute-force O(n^2) directed max-flooding (the pre-CSR implementation),
    kept as the oracle for the banded version."""
    pos = cands[:, :3].copy()
    pos[:, 2] *= depth_weight
    t = cands[:, 3]
    values = np.asarray(values, np.float64)
    close_t = np.abs(t[:, None] - t[None, :]) < tc_win
    d2 = ((pos[:, None] - pos[None]) ** 2).sum(-1)
    recv = close_t & (d2 < sp_win**2) & (values[None, :] >= values[:, None])
    np.fill_diagonal(recv, True)
    v = values.copy()
    for _ in range(n_steps):
        flooded = np.where(recv, v[None, :], -np.inf).max(axis=1)
        if np.abs(flooded - v).max() <= tol:
            break
        v = flooded
    return np.where(np.abs(v - values) <= tol * np.maximum(1, np.abs(values)))[0]


def test_local_marching_matches_dense_oracle():
    rng = np.random.default_rng(7)
    for trial in range(20):
        n = int(rng.integers(2, 120))
        cands = np.column_stack([
            rng.uniform(-30e3, 30e3, n), rng.uniform(-30e3, 30e3, n),
            rng.uniform(-15e3, 0, n), rng.uniform(0, 60, n)])
        vals = rng.uniform(0, 1, n)
        got = local_marching(cands, vals, tc_win=8.0, sp_win=20e3)
        want = _local_marching_dense(cands, vals, tc_win=8.0, sp_win=20e3)
        assert sorted(got.tolist()) == sorted(want.tolist()), trial


def test_local_marching_scales_to_real_day_candidate_counts():
    """206k candidates at thresh 0.1 on a real day OOM'd the dense pairwise
    matrix (317 GiB); the banded CSR version must handle it in O(n*window)."""
    rng = np.random.default_rng(1)
    n = 200_000
    cands = np.column_stack([
        rng.uniform(-200e3, 200e3, n), rng.uniform(-200e3, 200e3, n),
        rng.uniform(-30e3, 0, n), rng.uniform(0, 86400, n)])
    vals = rng.uniform(0, 0.2, n)
    keep = local_marching(cands, vals, tc_win=5.0, sp_win=17.5e3)
    assert 0 < len(keep) <= n


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


def _brute_force_assignment_obj(weights, ipick, cost, min_weight=0.0):
    """Enumerate every activation subset; exact optimum of the activation +
    assignment objective (feasible only for tiny n_src)."""
    import itertools

    from genie_tpu.infer.assign import _effective

    n_src = weights.shape[1]
    best = 0.0
    for bits in itertools.product([0, 1], repeat=n_src):
        act = np.array(bits, bool)
        obj, _, _ = _effective(weights, ipick, act, cost, min_weight)
        best = max(best, obj)
    return best


def test_competitive_assignment_matches_brute_force_randomized():
    """competitive_assignment is exact on random instances at pipeline
    component sizes (n_src ≤ exact_max_sources): 120 seeds vs full subset
    enumeration (VERDICT round-1 hardening item)."""
    rng = np.random.default_rng(0)
    for _ in range(120):
        n_src = int(rng.integers(1, 7))
        n_sta = int(rng.integers(1, 5))
        n_arv = int(rng.integers(0, 12))
        ipick = rng.integers(0, n_sta, n_arv)
        w = rng.uniform(0, 1, (n_arv, n_src, 2))
        w *= rng.uniform(0, 1, (n_arv, n_src, 2)) > 0.5
        cost = float(rng.uniform(0.1, 1.5))
        assign, active = competitive_assignment(w, ipick, cost)
        tot = sum(w[i, assign[i, 0], assign[i, 1]]
                  for i in range(n_arv) if assign[i, 0] >= 0)
        obj = tot - cost * active.sum()
        assert obj >= _brute_force_assignment_obj(w, ipick, cost) - 1e-9


def test_competitive_assignment_heuristic_near_exact():
    """Above exact_max_sources the pair-flip heuristic stays within 2% of the
    brute-force optimum on random 8-source instances (honest bound: the
    heuristic is not provably exact)."""
    rng = np.random.default_rng(1)
    worst = 1.0
    for _ in range(40):
        n_src, n_sta, n_arv = 8, 4, 14
        ipick = rng.integers(0, n_sta, n_arv)
        w = rng.uniform(0, 1, (n_arv, n_src, 2))
        w *= rng.uniform(0, 1, (n_arv, n_src, 2)) > 0.5
        cost = float(rng.uniform(0.1, 1.0))
        assign, active = competitive_assignment(w, ipick, cost,
                                                exact_max_sources=0)
        tot = sum(w[i, assign[i, 0], assign[i, 1]]
                  for i in range(n_arv) if assign[i, 0] >= 0)
        obj = tot - cost * active.sum()
        bf = _brute_force_assignment_obj(w, ipick, cost)
        if bf > 0:
            worst = min(worst, obj / bf)
    assert worst >= 0.98, worst


def test_exact_enumeration_covers_11_to_15_source_band():
    """The reference ILP is exact up to the max_sources_per_component=15
    split bound; the memoized component enumeration must match brute force
    on the 11-15-source band that previously fell to the heuristic (VERDICT
    round-2 item 6). Instances mirror real components: many stations, each
    arrival scoring only a few nearby sources, so per-station relevant sets
    stay small and the enumeration stays within its work budget (asserted:
    the exact path must actually run, not the fallback)."""
    from genie_tpu.infer.assign import _exact_enumeration

    rng = np.random.default_rng(7)
    n_exact = 0
    for trial in range(12):
        n_src = int(rng.integers(11, 16))
        n_sta = int(rng.integers(8, 16))
        n_arv = int(rng.integers(10, 26))
        ipick = rng.integers(0, n_sta, n_arv)
        w = rng.uniform(0, 1, (n_arv, n_src, 2))
        w *= rng.uniform(0, 1, (n_arv, n_src, 2)) > 0.88  # sparse: real graphs
        cost = float(rng.uniform(0.1, 1.0))
        res = _exact_enumeration(w, ipick, cost, 0.0)
        assert res is not None, f"trial {trial} fell to the budget fallback"
        n_exact += 1
        assign, active = competitive_assignment(w, ipick, cost)
        tot = sum(w[i, assign[i, 0], assign[i, 1]]
                  for i in range(n_arv) if assign[i, 0] >= 0)
        obj = tot - cost * active.sum()
        bf = _brute_force_assignment_obj(w, ipick, cost)
        assert obj >= bf - 1e-9, (trial, obj, bf)
        # assignments must respect the (station, source, phase) capacity
        for s in np.unique(ipick):
            rows = np.where((ipick == s) & (assign[:, 0] >= 0))[0]
            slots = [tuple(assign[r]) for r in rows]
            assert len(slots) == len(set(slots))
    assert n_exact == 12


def test_dense_component_falls_back_to_heuristic_within_gap():
    """Pathologically dense components exceed the enumeration work budget
    and fall to the flip heuristic; bound its gap vs brute force there."""
    rng = np.random.default_rng(11)
    for _ in range(3):
        n_src, n_sta, n_arv = 12, 4, 16
        ipick = rng.integers(0, n_sta, n_arv)
        w = rng.uniform(0.05, 1, (n_arv, n_src, 2))  # fully dense
        cost = float(rng.uniform(0.2, 0.8))
        assign, active = competitive_assignment(w, ipick, cost)
        tot = sum(w[i, assign[i, 0], assign[i, 1]]
                  for i in range(n_arv) if assign[i, 0] >= 0)
        obj = tot - cost * active.sum()
        bf = _brute_force_assignment_obj(w, ipick, cost)
        assert obj >= 0.97 * bf - 1e-9, (obj, bf)


def test_locate_sources_batched_matches_planted_events():
    """Vmapped DE location (one device call per bucket) recovers several
    planted events as well as the single-event path."""
    from genie_tpu.infer.locate import (locate_sources_batched,
                                        location_uncertainty_batched)

    rng = np.random.default_rng(4)
    proj = Projection.from_center((40.0, -124.0))
    tt = HomogeneousTravelTime(proj)
    n_sta, n_ev, L = 16, 5, 32
    sta = rng.uniform(-60e3, 60e3, (n_sta, 3)).astype(np.float32)
    sta[:, 2] = 0.0
    true_pos = rng.uniform(-40e3, 40e3, (n_ev, 3)).astype(np.float32)
    true_pos[:, 2] = rng.uniform(-20e3, -3e3, n_ev)
    true_t0 = rng.uniform(0, 10, n_ev).astype(np.float32)
    tp = np.zeros((n_ev, L), np.float32)
    ip = np.zeros((n_ev, L), np.int32)
    ph = np.zeros((n_ev, L, 1), np.float32)
    mk = np.zeros((n_ev, L), bool)
    for e in range(n_ev):
        trv = np.asarray(tt.from_cart(jnp.asarray(sta),
                                      jnp.asarray(true_pos[e][None])))[0]
        k = 0
        for s in range(n_sta):
            tp[e, k] = true_t0[e] + trv[s, 0]; ip[e, k] = s; k += 1
            if s % 2 == 0:
                tp[e, k] = true_t0[e] + trv[s, 1]; ip[e, k] = s
                ph[e, k, 0] = 1.0; k += 1
        mk[e, :k] = True
    lo = np.array([-80e3, -80e3, -40e3, -10.0], np.float32)
    hi = np.array([80e3, 80e3, 2e3, 30.0], np.float32)
    pos, t0, cost = locate_sources_batched(
        jax.random.PRNGKey(1), tt.from_cart, jnp.asarray(sta),
        tp, ip, ph, mk, lo, hi, popsize=96, n_iter=120)
    pos, t0 = np.asarray(pos), np.asarray(t0)
    assert (np.linalg.norm(pos - true_pos, axis=1) < 3e3).all()
    assert (np.abs(t0 - true_t0) < 0.5).all()
    cov = location_uncertainty_batched(tt.from_cart, jnp.asarray(sta),
                                       pos, t0, tp, ip, ph, mk)
    assert np.asarray(cov).shape == (n_ev, 4, 4)
    assert np.all(np.isfinite(np.asarray(cov)))


def test_pso_hull_reinit_and_depth_search():
    """PSO with station-hull half-spaces keeps the solution inside the hull
    (out-of-hull particles are re-initialized, ref process_utils.py:
    1415-1422) and the final depth line-search recovers a deep source."""
    from genie_tpu.infer.locate import locate_source_pso, pso_minimize
    from genie_tpu.utils import hull_halfspaces

    # hull containment: minimize distance to a target OUTSIDE the hull
    pts = np.array([[0.0, 0], [10, 0], [10, 10], [0, 10]], np.float32)
    A, b = hull_halfspaces(pts)
    target = jnp.asarray([25.0, 5.0])
    obj = lambda x: jnp.linalg.norm(x - target[None], axis=1)
    lo = jnp.asarray([-5.0, -5.0]); hi = jnp.asarray([30.0, 30.0])
    x_free, _ = pso_minimize(obj, lo, hi, jax.random.PRNGKey(0),
                             popsize=64, n_iter=60)
    x_hull, _ = pso_minimize(obj, lo, hi, jax.random.PRNGKey(0),
                             popsize=64, n_iter=60,
                             hull_A=jnp.asarray(A, jnp.float32),
                             hull_b=jnp.asarray(b, jnp.float32))
    assert float(x_free[0]) > 20.0          # unconstrained reaches target
    inside = (np.asarray(x_hull) @ A.T + b) <= 1e-3
    assert inside.all()                      # constrained stays in hull

    # full locator: planted deep event, stations at the surface
    rng = np.random.default_rng(7)
    proj = Projection.from_center((40.0, -124.0))
    tt = HomogeneousTravelTime(proj)
    n_sta = 16
    sta = rng.uniform(-50e3, 50e3, (n_sta, 3)).astype(np.float32)
    sta[:, 2] = 0.0
    true_pos = np.array([5e3, -8e3, -22e3], np.float32)
    trv = np.asarray(tt.from_cart(jnp.asarray(sta), jnp.asarray(true_pos[None])))[0]
    tp = jnp.asarray(2.0 + trv[:, 0])
    ip = jnp.asarray(np.arange(n_sta, dtype=np.int32))
    ph = jnp.zeros((n_sta, 1), jnp.float32)
    mk = jnp.ones(n_sta, bool)
    lo4 = np.array([-80e3, -80e3, -40e3, -10.0], np.float32)
    hi4 = np.array([80e3, 80e3, 2e3, 30.0], np.float32)
    pos, t0, cost = locate_source_pso(
        jax.random.PRNGKey(2), tt.from_cart, jnp.asarray(sta), tp, ip, ph, mk,
        lo4, hi4, popsize=128, n_iter=150, hull_points=sta)
    assert np.linalg.norm(np.asarray(pos)[:2] - true_pos[:2]) < 5e3
    assert abs(float(t0) - 2.0) < 1.0


def test_competitive_assignment_restrict_pairs():
    """restrict (ref process_utils.py:970-986): of each listed source pair
    at most one may be active; the exact path must pick the better member
    and re-route arrivals, and stays optimal among feasible subsets."""
    import numpy as np
    from genie_tpu.infer.assign import competitive_assignment

    n_arv, n_src = 12, 3
    ipick = np.arange(n_arv)  # one arrival per station: duplicates compete
    w = np.zeros((n_arv, n_src, 2), np.float32)
    # sources 0 and 1 both explain arrivals 0-5 (duplicates, 0 stronger);
    # source 2 explains arrivals 6-11
    w[:6, 0, 0] = 0.9
    w[:6, 1, 0] = 0.8
    w[6:, 2, 0] = 0.7
    a_free, act_free = competitive_assignment(w, ipick, cost=0.5)
    assert act_free[0] and act_free[2] and not act_free[1]

    # forbidding {0, 2} together: the optimum re-routes arrivals 0-5 to the
    # weaker duplicate 1 ({1,2} = 8.0 beats {0} = 4.9 and {2} = 3.7)
    a_r, act_r = competitive_assignment(w, ipick, cost=0.5,
                                        restrict=[(0, 2)])
    assert not (act_r[0] and act_r[2])         # constraint honoured
    assert act_r[1] and act_r[2] and not act_r[0]
    assert (a_r[:6, 0] == 1).all() and (a_r[6:, 0] == 2).all()

    # restricting the duplicate pair picks the stronger duplicate
    a_d, act_d = competitive_assignment(w, ipick, cost=0.5,
                                        restrict=[(0, 1)])
    assert act_d[0] and not act_d[1] and act_d[2]
