import pytest
import numpy as np
import jax
import jax.numpy as jnp

from genie_tpu.models.detector import Detector
from genie_tpu.infer.pipeline import InferencePipeline, self_check_featurization
from genie_tpu.train.trainer import init_train_state

from tests.test_trainer import tiny_config, tiny_domain


def test_self_check_featurization():
    """The reference's embedded scatter-overflow self-check (:651-697):
    planted picks must light up the featurization at the true source cells."""
    cfg = tiny_config()
    ctx, tt = tiny_domain(cfg)
    ok_hit, ok_miss = self_check_featurization(ctx, tt.from_cart,
                                               cfg.train.src_t_kernel)
    assert ok_hit
    assert ok_miss


def test_pipeline_end_to_end_smoke():
    """Full day-pipeline mechanics on an untrained model: must run through
    sweep → peaks → clustering → association → location without error."""
    cfg = tiny_config()
    cfg.process.thresh = 0.05  # untrained model produces small outputs
    cfg.process.thresh_assoc = 0.02
    cfg.process.min_required_picks = 3
    cfg.process.min_required_sta = 2
    ctx, tt = tiny_domain(cfg)
    model = Detector(src_chunk=4)
    state = init_train_state(model, cfg, ctx, tt.from_cart, jax.random.PRNGKey(0))
    pipe = InferencePipeline(model, state.params, cfg, ctx, tt.from_cart)

    # fabricate a 3-minute span with 2 planted events
    rng = np.random.default_rng(0)
    n_sta = ctx.sta_cart.shape[0]
    trv = np.asarray(ctx.trv_grids[0])
    pick_t, pick_sta, pick_ph = [], [], []
    for s_idx, t_ev in ((3, 40.0), (17, 120.0)):
        for st in range(n_sta):
            pick_t.append(t_ev + trv[s_idx, st, 0] + rng.normal(0, 0.1))
            pick_sta.append(st)
            pick_ph.append(0)
            pick_t.append(t_ev + trv[s_idx, st, 1] + rng.normal(0, 0.15))
            pick_sta.append(st)
            pick_ph.append(1)
    # noise picks
    for _ in range(30):
        pick_t.append(rng.uniform(0, 180))
        pick_sta.append(rng.integers(0, n_sta))
        pick_ph.append(rng.integers(0, 2))
    order = np.argsort(pick_t)
    pick_t = np.array(pick_t, np.float32)[order]
    pick_sta = np.array(pick_sta, np.int64)[order]
    pick_ph = np.array(pick_ph, np.float32)[order]

    events = pipe.process(pick_t, pick_sta, pick_ph, 0.0, 180.0)
    assert isinstance(events, list)
    for ev in events:
        assert np.isfinite(ev.pos_cart).all()
        assert np.isfinite(ev.time)


def test_associate_and_locate_with_perfect_weights(monkeypatch):
    """Bypass the (untrained) network: patch the association forward with
    oracle weights and verify assignment+location recover the planted event."""
    cfg = tiny_config()
    cfg.process.min_required_picks = 5
    cfg.process.min_required_sta = 3
    ctx, tt = tiny_domain(cfg)
    model = Detector(src_chunk=4)
    state = init_train_state(model, cfg, ctx, tt.from_cart, jax.random.PRNGKey(0))
    pipe = InferencePipeline(model, state.params, cfg, ctx, tt.from_cart)

    rng = np.random.default_rng(1)
    n_sta = ctx.sta_cart.shape[0]
    true_pos = np.array([5e3, -10e3, -8e3], np.float32)
    true_t = 60.0
    trv = np.asarray(tt.from_cart(ctx.sta_cart, jnp.asarray(true_pos[None])))[0]
    pick_t, pick_sta, pick_ph = [], [], []
    for st in range(n_sta):
        pick_t.append(true_t + trv[st, 0]); pick_sta.append(st); pick_ph.append(0)
        pick_t.append(true_t + trv[st, 1]); pick_sta.append(st); pick_ph.append(1)
    pick_t = np.array(pick_t, np.float32)
    pick_sta = np.array(pick_sta, np.int64)
    pick_ph = np.array(pick_ph, np.float32)

    def oracle_assoc(tp, ip, ph, pm, xq, tq, sta_mask, sta_nbr,
                     sta_nbr_valid, grid):
        # weight 1 for picks matching theoretical times of the query source
        tp, ip, ph, pm = map(np.asarray, (tp, ip, ph, pm))
        xq, tq = np.asarray(xq), np.asarray(tq)
        n_q, n_p = len(xq), len(tp)
        w_p = np.zeros((n_q, n_p), np.float32)
        w_s = np.zeros((n_q, n_p), np.float32)
        for q in range(n_q):
            trv_q = np.asarray(tt.from_cart(ctx.sta_cart, jnp.asarray(xq[q][None])))[0]
            dp = np.abs(tp - (trv_q[ip, 0] + tq[q]))
            ds = np.abs(tp - (trv_q[ip, 1] + tq[q]))
            w_p[q] = np.exp(-0.5 * dp**2 / 1.0) * pm
            w_s[q] = np.exp(-0.5 * ds**2 / 1.0) * pm
        return jnp.asarray(w_p), jnp.asarray(w_s)

    monkeypatch.setattr(pipe, "_assoc_fn", oracle_assoc)
    srcs = np.array([[4e3, -11e3, -9e3, true_t + 0.5]])  # near-truth candidate
    events = pipe.associate(pick_t, pick_sta, pick_ph, srcs)
    assert len(events) == 1
    assert len(events[0].picks) >= n_sta  # most picks associated
    located = pipe.locate(events, pick_t, pick_sta)
    assert len(located) == 1
    assert np.linalg.norm(located[0].pos_cart - true_pos) < 5e3
    assert abs(located[0].time - true_t) < 1.0


@pytest.mark.slow
def test_associate_per_source_two_close_events(monkeypatch):
    """Per-source association (ref per-source forward_fixed,
    process_continuous_days.py:1020-1065): two events 8 s apart — inside one
    t_win, the case where the shared-span window queries the later source
    beyond the trained tq range — must EACH keep their own picks, with the
    competitive assignment splitting the shared weight graph."""
    cfg = tiny_config()
    cfg.process.min_required_picks = 5
    cfg.process.min_required_sta = 3
    cfg.process.assoc_mode = "per_source"
    ctx, tt = tiny_domain(cfg)
    model = Detector(src_chunk=4)
    state = init_train_state(model, cfg, ctx, tt.from_cart, jax.random.PRNGKey(0))
    pipe = InferencePipeline(model, state.params, cfg, ctx, tt.from_cart)

    n_sta = ctx.sta_cart.shape[0]
    pos_a = np.array([5e3, -10e3, -8e3], np.float32)
    pos_b = np.array([-12e3, 8e3, -5e3], np.float32)
    t_a, t_b = 60.0, 68.0
    pick_t, pick_sta, pick_ph = [], [], []
    for pos, t_ev in ((pos_a, t_a), (pos_b, t_b)):
        trv = np.asarray(tt.from_cart(ctx.sta_cart, jnp.asarray(pos[None])))[0]
        for st in range(n_sta):
            pick_t.append(t_ev + trv[st, 0]); pick_sta.append(st); pick_ph.append(0)
            pick_t.append(t_ev + trv[st, 1]); pick_sta.append(st); pick_ph.append(1)
    order = np.argsort(pick_t)
    pick_t = np.array(pick_t, np.float32)[order]
    pick_sta = np.array(pick_sta, np.int64)[order]
    pick_ph = np.array(pick_ph, np.float32)[order]

    def oracle_ps(tp, ip, ph, pm, xq, tq, sta_mask, sta_nbr, sta_nbr_valid,
                  grid):
        # batched: tp/ip/pm (B, n_pick); xq (B, 1, 3); tq (B, 1)
        tp, ip, pm = map(np.asarray, (tp, ip, pm))
        xq, tq = np.asarray(xq), np.asarray(tq)
        B, n_p = tp.shape
        w_p = np.zeros((B, 1, n_p), np.float32)
        w_s = np.zeros((B, 1, n_p), np.float32)
        for b in range(B):
            trv_q = np.asarray(tt.from_cart(ctx.sta_cart,
                                            jnp.asarray(xq[b])))[0]
            dp = np.abs(tp[b] - (trv_q[ip[b], 0] + tq[b, 0]))
            ds = np.abs(tp[b] - (trv_q[ip[b], 1] + tq[b, 0]))
            w_p[b, 0] = np.exp(-0.5 * dp**2 / 1.0) * pm[b]
            w_s[b, 0] = np.exp(-0.5 * ds**2 / 1.0) * pm[b]
        return jnp.asarray(w_p), jnp.asarray(w_s)

    monkeypatch.setattr(pipe, "_assoc_ps_fn", oracle_ps)
    srcs = np.array([[*(pos_a + 500.0), t_a + 0.3],
                     [*(pos_b - 500.0), t_b - 0.3]], np.float32)
    events = pipe.associate_per_source(pick_t, pick_sta, pick_ph, srcs,
                                       vals=np.array([0.5, 0.4]))
    assert len(events) == 2
    by_t = sorted(events, key=lambda e: e.time)
    # each event keeps (mostly) its own picks: planted picks alternate by
    # event in sorted order, and every pick index is globally unique
    for ev, t_ev in zip(by_t, (t_a, t_b)):
        assert len(ev.picks) >= n_sta
        tt_ev = pick_t[ev.picks]
        assert np.all(np.abs(tt_ev - t_ev) < 40.0)
    assert not set(by_t[0].picks) & set(by_t[1].picks)


def test_use_subgraph_mode():
    """use_subgraph: a wide ε-ball reproduces the dense sweep exactly; a
    tight ε-ball (few nearest pairs) changes it (ref process_utils.py:744-849)."""
    cfg = tiny_config()
    ctx, tt = tiny_domain(cfg)
    model = Detector(src_chunk=4)
    state = init_train_state(model, cfg, ctx, tt.from_cart, jax.random.PRNGKey(0))

    rng = np.random.default_rng(1)
    n_sta = int(ctx.sta_cart.shape[0])
    n_pick = cfg.graph.max_picks
    tpick = jnp.asarray(np.sort(rng.uniform(0, 30, n_pick)).astype(np.float32))
    ipick = jnp.asarray(rng.integers(0, n_sta, n_pick))
    phase = jnp.asarray(rng.integers(0, 2, (n_pick, 1)).astype(np.float32))
    pmask = jnp.ones(n_pick, bool)

    def sweep(c):
        pipe = InferencePipeline(model, state.params, c, ctx, tt.from_cart)
        return np.asarray(pipe._sweep_batch_fn(
            tpick[None], ipick[None], phase[None], pmask[None],
            pipe.sta_mask, pipe.sta_nbr, pipe.sta_nbr_valid, 0))

    dense = sweep(cfg)

    cfg.graph.use_subgraph = True
    cfg.graph.max_deg_offset = 180.0  # everything inside: must be identical
    assert np.allclose(sweep(cfg), dense, atol=1e-6)

    cfg.graph.max_deg_offset = 1e-6   # only k nearest pairs survive
    cfg.graph.k_nearest_pairs = 2
    assert not np.allclose(sweep(cfg), dense, atol=1e-4)


def test_set_station_mask_retraces_all_stages():
    """Regression: the station mask is a traced argument of every jitted
    stage (sweep/trunk/refine/assoc) — calling set_station_mask after the
    first trace must change the outputs (it used to be baked in as a jit
    constant for refine/assoc, silently reusing day 1's subnetwork)."""
    cfg = tiny_config()
    ctx, tt = tiny_domain(cfg)
    model = Detector(src_chunk=4)
    state = init_train_state(model, cfg, ctx, tt.from_cart, jax.random.PRNGKey(0))
    pipe = InferencePipeline(model, state.params, cfg, ctx, tt.from_cart)

    rng = np.random.default_rng(2)
    n_sta = int(ctx.sta_cart.shape[0])
    n_pick = cfg.graph.max_picks
    tp = jnp.asarray(np.sort(rng.uniform(0, 30, n_pick)).astype(np.float32))
    ip = jnp.asarray(rng.integers(0, n_sta, n_pick))
    ph = jnp.asarray(rng.integers(0, 2, (n_pick, 1)).astype(np.float32))
    pm = jnp.ones(n_pick, bool)
    xq = jnp.asarray(np.asarray(ctx.grids_cart[0][:8], np.float32))
    tq = jnp.zeros(8, np.float32)

    def run_all():
        trunk = pipe._trunk_fn(tp, ip, ph, pm, pipe.sta_mask, pipe.sta_nbr,
                               pipe.sta_nbr_valid, grid=0)
        ref = pipe._refine_fn(trunk, xq, pipe.sta_mask, pipe.sta_nbr,
                              pipe.sta_nbr_valid, grid=0)
        ap, as_ = pipe._assoc_fn(tp, ip, ph, pm, xq, tq, pipe.sta_mask,
                                 pipe.sta_nbr, pipe.sta_nbr_valid, grid=0)
        return np.asarray(ref), np.asarray(ap)

    full_ref, full_ap = run_all()          # first trace: all stations
    pipe.set_station_mask(np.arange(n_sta // 2))   # day 2: half subnetwork
    half_ref, half_ap = run_all()
    assert not np.allclose(full_ref, half_ref)
    assert not np.allclose(full_ap, half_ap)


def test_sweep_half_matches_f32():
    """bf16 sweep (the day-processing hot loop at 2x MXU/HBM) must track the
    f32 series closely — featurization and output stay f32."""
    import sys
    sys.path.insert(0, str(__import__('pathlib').Path(__file__).parent))
    from test_trainer import tiny_config, tiny_domain
    from genie_tpu.infer.pipeline import InferencePipeline
    from genie_tpu.models.detector import Detector
    from genie_tpu.train.trainer import init_train_state

    cfg = tiny_config()
    ctx, tt = tiny_domain(cfg)
    model = Detector(src_chunk=8)
    state = init_train_state(model, cfg, ctx, tt.from_cart, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    n = 300
    pick_t = np.sort(rng.uniform(0, 300, n)).astype(np.float32)
    pick_sta = rng.integers(0, ctx.sta_cart.shape[0], n)
    pick_ph = rng.integers(0, 2, n).astype(np.float32)

    p32 = InferencePipeline(model, state.params, cfg, ctx, tt.from_cart)
    p16 = InferencePipeline(model, state.params, cfg, ctx, tt.from_cart,
                            sweep_half=True)
    _, s32 = p32.detection_sweep(pick_t, pick_sta, pick_ph, 0.0, 300.0)
    _, s16 = p16.detection_sweep(pick_t, pick_sta, pick_ph, 0.0, 300.0)
    assert s16.dtype == np.float32
    assert np.abs(s32 - s16).max() < 0.05


def _fault_day(ctx):
    """A 3-minute pick span dense enough to produce several sweep batches."""
    rng = np.random.default_rng(3)
    n_sta = ctx.sta_cart.shape[0]
    trv = np.asarray(ctx.trv_grids[0])
    pick_t, pick_sta, pick_ph = [], [], []
    for s_idx, t_ev in ((2, 30.0), (11, 90.0), (7, 150.0)):
        for st in range(n_sta):
            pick_t.append(t_ev + trv[s_idx, st, 0] + rng.normal(0, 0.1))
            pick_sta.append(st)
            pick_ph.append(0)
    order = np.argsort(pick_t)
    return (np.array(pick_t, np.float32)[order],
            np.array(pick_sta, np.int64)[order],
            np.array(pick_ph, np.float32)[order])


def test_sweep_retries_transient_batch_failures(monkeypatch):
    """Injected failure: the first few sweep-batch dispatches raise (the
    round-2 real-day run died to exactly one such transient tunnel error);
    with retries the sweep must complete and match the clean sweep."""
    cfg = tiny_config()
    ctx, tt = tiny_domain(cfg)
    model = Detector(src_chunk=4)
    state = init_train_state(model, cfg, ctx, tt.from_cart, jax.random.PRNGKey(0))
    pipe = InferencePipeline(model, state.params, cfg, ctx, tt.from_cart)
    pick_t, pick_sta, pick_ph = _fault_day(ctx)

    times_c, series_c = pipe.detection_sweep(pick_t, pick_sta, pick_ph,
                                             0.0, 180.0, window_batch=2)

    real_fn = pipe._sweep_batch_fn
    fails = {"n": 3}

    def flaky(*a, **k):
        if fails["n"] > 0:
            fails["n"] -= 1
            raise RuntimeError("injected tunnel failure")
        return real_fn(*a, **k)

    monkeypatch.setattr(pipe, "_sweep_batch_fn", flaky)
    times_f, series_f = pipe.detection_sweep(pick_t, pick_sta, pick_ph,
                                             0.0, 180.0, window_batch=2,
                                             max_retries=4, retry_wait=0.0)
    assert fails["n"] == 0  # failures actually happened
    np.testing.assert_allclose(series_f, series_c, atol=1e-6)
    np.testing.assert_allclose(times_f, times_c)


def test_sweep_exhausted_retries_raise(monkeypatch):
    cfg = tiny_config()
    ctx, tt = tiny_domain(cfg)
    model = Detector(src_chunk=4)
    state = init_train_state(model, cfg, ctx, tt.from_cart, jax.random.PRNGKey(0))
    pipe = InferencePipeline(model, state.params, cfg, ctx, tt.from_cart)
    pick_t, pick_sta, pick_ph = _fault_day(ctx)

    def always_fail(*a, **k):
        raise RuntimeError("permanent failure")

    monkeypatch.setattr(pipe, "_sweep_batch_fn", always_fail)
    import pytest
    with pytest.raises(RuntimeError, match="permanent failure"):
        pipe.detection_sweep(pick_t, pick_sta, pick_ph, 0.0, 180.0,
                             window_batch=2, max_retries=1, retry_wait=0.0)


def test_sweep_checkpoint_resume(tmp_path, monkeypatch):
    """Kill the sweep partway (hard failure), restart with the same
    checkpoint path: it must resume from the saved prefix and produce the
    identical series, then clean up the partial file."""
    cfg = tiny_config()
    ctx, tt = tiny_domain(cfg)
    model = Detector(src_chunk=4)
    state = init_train_state(model, cfg, ctx, tt.from_cart, jax.random.PRNGKey(0))
    pipe = InferencePipeline(model, state.params, cfg, ctx, tt.from_cart)
    pick_t, pick_sta, pick_ph = _fault_day(ctx)

    times_c, series_c = pipe.detection_sweep(pick_t, pick_sta, pick_ph,
                                             0.0, 180.0, window_batch=2)
    ckpt = tmp_path / "sweep.partial.npz"
    real_fn = pipe._sweep_batch_fn
    calls = {"n": 0}

    def dies_midway(*a, **k):
        calls["n"] += 1
        if calls["n"] > 4:
            raise RuntimeError("injected crash")
        return real_fn(*a, **k)

    monkeypatch.setattr(pipe, "_sweep_batch_fn", dies_midway)
    import pytest
    with pytest.raises(RuntimeError):
        pipe.detection_sweep(pick_t, pick_sta, pick_ph, 0.0, 180.0,
                             window_batch=2, checkpoint_path=ckpt,
                             checkpoint_every=1, max_retries=0,
                             retry_wait=0.0)
    assert ckpt.exists()  # partial progress survived the crash
    n_done_saved = int(np.load(ckpt)["n_done"])
    assert n_done_saved >= 1

    monkeypatch.setattr(pipe, "_sweep_batch_fn", real_fn)
    calls2 = {"n": 0}

    def counting(*a, **k):
        calls2["n"] += 1
        return real_fn(*a, **k)

    monkeypatch.setattr(pipe, "_sweep_batch_fn", counting)
    times_r, series_r = pipe.detection_sweep(pick_t, pick_sta, pick_ph,
                                             0.0, 180.0, window_batch=2,
                                             checkpoint_path=ckpt,
                                             checkpoint_every=1)
    np.testing.assert_allclose(series_r, series_c, atol=1e-6)
    np.testing.assert_allclose(times_r, times_c)
    assert not ckpt.exists()  # completed: partial removed
    # resumed run skipped the already-completed prefix
    total_batches = calls["n"] - 1  # minus the crashing call
    assert calls2["n"] < calls["n"] + calls2["n"]


def test_sweep_checkpoint_fingerprint_mismatch_restarts(tmp_path):
    """A checkpoint from different sweep geometry must be rejected."""
    cfg = tiny_config()
    ctx, tt = tiny_domain(cfg)
    model = Detector(src_chunk=4)
    state = init_train_state(model, cfg, ctx, tt.from_cart, jax.random.PRNGKey(0))
    pipe = InferencePipeline(model, state.params, cfg, ctx, tt.from_cart)
    pick_t, pick_sta, pick_ph = _fault_day(ctx)

    times_c, series_c = pipe.detection_sweep(pick_t, pick_sta, pick_ph,
                                             0.0, 180.0, window_batch=2)
    ckpt = tmp_path / "sweep.partial.npz"
    # checkpoint from a DIFFERENT span
    pipe.detection_sweep(pick_t, pick_sta, pick_ph, 0.0, 120.0,
                         window_batch=2, checkpoint_path=ckpt,
                         checkpoint_every=1, max_retries=0)
    # simulate leftover partial by writing one with a wrong fingerprint
    np.savez(ckpt, acc=np.zeros((pipe.x_query.shape[0], 5), np.float32),
             cnt=np.zeros(5, np.float32), n_done=99,
             fingerprint=np.arange(8, dtype=np.float64))
    times_r, series_r = pipe.detection_sweep(pick_t, pick_sta, pick_ph,
                                             0.0, 180.0, window_batch=2,
                                             checkpoint_path=ckpt)
    np.testing.assert_allclose(series_r, series_c, atol=1e-6)
