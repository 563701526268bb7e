import numpy as np
import jax
import jax.numpy as jnp

from genie_tpu.config import Config
from genie_tpu.models.detector import Detector
from genie_tpu.models.travel_time import HomogeneousTravelTime
from genie_tpu.geometry import Projection
from genie_tpu.train.trainer import (
    build_domain_context,
    generate_batch,
    init_train_state,
    make_train_step,
)


def tiny_config():
    cfg = Config()
    cfg.graph.max_sta = 16
    cfg.graph.n_spatial_nodes = 50
    cfg.graph.n_grids = 2
    cfg.graph.max_picks = 64
    cfg.graph.k_sta_edges = 4
    cfg.graph.k_spc_edges = 6
    cfg.graph.k_time_edges = 5
    cfg.graph.k_spatial_attn = 5
    cfg.graph.k_pick_pairs = 6
    cfg.train.n_batch = 2
    cfg.train.n_spc_query = 40
    cfg.train.n_src_query = 10
    cfg.synth.max_events = 16
    cfg.synth.n_false_max = 64
    cfg.synth.T = 600.0
    cfg.synth.max_rate_events = 8.0
    cfg.synth.dist_range = (15e3, 150e3)
    return cfg


def tiny_domain(cfg, seed=0):
    rng = np.random.default_rng(seed)
    n_sta = cfg.graph.max_sta
    n_src = cfg.graph.n_spatial_nodes
    n_grids = cfg.graph.n_grids
    sta_cart = rng.uniform(-60e3, 60e3, (n_sta, 3)).astype(np.float32)
    sta_cart[:, 2] = rng.uniform(-1e3, 1e3, n_sta)
    proj = Projection.from_center(cfg.region.center)
    sta_lla = np.asarray(proj.to_lla_np(sta_cart), np.float32)
    grids_cart = rng.uniform(-80e3, 80e3, (n_grids, n_src, 3)).astype(np.float32)
    grids_cart[:, :, 2] = rng.uniform(-40e3, 2e3, (n_grids, n_src))
    grids_lla = np.stack([np.asarray(proj.to_lla_np(g), np.float32) for g in grids_cart])
    tt = HomogeneousTravelTime(proj)
    trv_grids = np.stack([
        np.asarray(tt.from_cart(jnp.asarray(sta_cart), jnp.asarray(g)))
        for g in grids_cart
    ])
    ctx = build_domain_context(cfg, sta_lla, sta_cart, grids_lla, grids_cart, trv_grids)
    return ctx, tt


def test_generate_batch_shapes():
    cfg = tiny_config()
    ctx, tt = tiny_domain(cfg)
    wb = generate_batch(jax.random.PRNGKey(0), cfg, ctx, tt.from_cart)
    B, n_src, n_sta = cfg.train.n_batch, 50, 16
    assert wb.feat.shape == (B, n_src, n_sta, 4)
    assert wb.tpick.shape == (B, cfg.graph.max_picks)
    assert wb.lbl_grid.shape == (B, n_src, 9)
    assert wb.lbl_query.shape == (B, cfg.train.n_spc_query, 9)
    assert wb.lbl_assoc.shape == (B, cfg.train.n_src_query, cfg.graph.max_picks, 2)
    for leaf in jax.tree.leaves(wb):
        assert np.isfinite(np.asarray(leaf, np.float32)).all()
    # features must light up somewhere (events produce picks near moveouts)
    assert float(wb.feat.max()) > 0.5
    # labels in [0, 1]
    assert float(wb.lbl_grid.max()) <= 1.0 + 1e-5
    assert float(wb.lbl_grid.min()) >= 0.0


def test_train_step_runs_and_improves():
    cfg = tiny_config()
    ctx, tt = tiny_domain(cfg)
    model = Detector(src_chunk=5)
    state = init_train_state(model, cfg, ctx, tt.from_cart, jax.random.PRNGKey(0))
    step, _ = make_train_step(model, cfg, ctx, tt.from_cart)
    losses = []
    for i in range(3):
        state, metrics = step(state, jax.random.PRNGKey(i + 1))
        assert np.isfinite(float(metrics["loss"]))
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 3


def test_fixed_subnetworks_used_in_windows():
    import jax.numpy as jnp
    from genie_tpu.synth.generator import make_windows, synthesize_timeline

    cfg = tiny_config()
    ctx, tt = tiny_domain(cfg)
    n_sta = ctx.sta_cart.shape[0]
    subnet = np.zeros((2, n_sta), bool)
    subnet[0, :5] = True
    subnet[1, 5:10] = True
    tl = synthesize_timeline(
        jax.random.PRNGKey(0), cfg.synth, ctx.sta_cart, tt.from_cart,
        ctx.scale_cart, ctx.offset_cart,
        (ctx.offset_cart[2], ctx.offset_cart[2] + ctx.scale_cart[2]),
        n_sta_real=n_sta)
    cfg.train.n_batch = 8
    wb = make_windows(
        jax.random.PRNGKey(5), cfg.synth, cfg.train, cfg.graph, tl,
        ctx.sta_cart, ctx.grids_cart, ctx.trv_grids, ctx.scale_cart,
        ctx.offset_cart, subnetworks=jnp.asarray(subnet))
    masks = np.asarray(wb.sta_mask)
    # at least one window uses one of the two provided subnetworks verbatim
    hit = any((masks[i] == subnet[j]).all() for i in range(8) for j in range(2))
    assert hit


def test_featurization_precision_at_high_station_index():
    """Regression: with 374 stations the sort-key offset must not destroy
    sub-second time resolution in float32 (station-separating offset must be
    span-scaled, not a large constant)."""
    import jax.numpy as jnp
    from genie_tpu.synth.generator import featurize_window

    n_src, n_sta = 20, 374
    rng = np.random.default_rng(0)
    trv = rng.uniform(5, 200, (n_src, n_sta, 2)).astype(np.float32)
    s_true = 7
    # picks exactly at the theoretical P times of source s_true at the LAST
    # stations (the worst-precision keys)
    stas = np.arange(n_sta - 8, n_sta)
    tp = trv[s_true, stas, 0]
    feat, _ = featurize_window(
        jnp.asarray(tp), jnp.asarray(stas.astype(np.int32)),
        jnp.asarray(np.zeros((len(stas), 1), np.float32)),
        jnp.ones(len(stas), bool), jnp.asarray(trv), 3.0,
        jnp.ones(n_sta, bool))
    f = np.asarray(feat)
    assert (f[s_true, stas, 0] > 0.99).all()


def test_reference_density_event_sampling():
    """use_reference_spatial_density: blurred reference-catalog draws replace
    most event positions (ref train_GENIE_model.py:551-557)."""
    from genie_tpu.synth.generator import synthesize_timeline

    cfg = tiny_config()
    cfg.synth.use_reference_spatial_density = True
    cfg.synth.frac_reference_catalog = 1.0
    cfg.synth.spatial_sigma = 500.0
    ctx, tt = tiny_domain(cfg)
    ref = np.array([[30e3, -20e3, -8e3]], np.float32)  # one tight cluster
    scale = ctx.scale_cart
    offset = ctx.offset_cart
    tl = jax.jit(lambda k: synthesize_timeline(
        k, cfg.synth, ctx.sta_cart, tt.from_cart, scale, offset,
        (offset[2], offset[2] + scale[2]), n_sta_real=16,
        ref_srcs_cart=jnp.asarray(ref)))(jax.random.PRNGKey(3))
    ev = np.asarray(tl.ev_pos_cart)[np.asarray(tl.ev_mask)]
    d = np.linalg.norm(ev[:, :2] - ref[0, :2], axis=1)
    assert np.all(d < 5e3)  # all positions near the reference cluster


def test_correlated_travel_time_noise():
    """use_correlated_noise: co-located stations get near-identical arrival
    residuals under a long correlation length; independent Laplace noise
    does not (ref :331-481)."""
    from genie_tpu.synth.generator import synthesize_timeline
    from genie_tpu.train.trainer import _corr_chol

    cfg = tiny_config()
    cfg.synth.max_rate_events = 16.0
    # co-located stations: identical trv; any pick-time spread = noise spread
    n_sta = cfg.graph.max_sta
    sta = np.tile(np.array([[10e3, 5e3, 0.0]], np.float32), (n_sta, 1))
    sta += np.random.default_rng(0).normal(0, 10.0, sta.shape).astype(np.float32)
    proj = Projection.from_center(cfg.region.center)
    tt = HomogeneousTravelTime(proj)
    scale = jnp.asarray([160e3, 160e3, 40e3], jnp.float32)
    offset = jnp.asarray([-80e3, -80e3, -40e3], jnp.float32)

    # workable softplus params: beta=1 (10^0), shift 0, std ~ 5% of t
    cfg.synth.use_correlated_noise = True
    cfg.synth.corr_noise_params = (0.05, 0.0, 0.01, 0.01, 1e9, 0.0, 0.0)
    L = _corr_chol(cfg, sta)
    assert np.allclose(np.asarray(L)[:, 0], 1.0, atol=1e-2)  # rank-1 at l->inf

    def spread(corr_chol, use):
        cfg.synth.use_correlated_noise = use
        tl = jax.jit(lambda k: synthesize_timeline(
            k, cfg.synth, jnp.asarray(sta), tt.from_cart, scale, offset,
            (offset[2], offset[2] + scale[2]), n_sta_real=n_sta,
            corr_chol=corr_chol))(jax.random.PRNGKey(2))
        t = np.asarray(tl.pick_t)
        evi = np.asarray(tl.pick_event)
        ph = np.asarray(tl.pick_phase)
        m = np.asarray(tl.pick_mask) & (evi >= 0) & np.asarray(tl.pick_assoc_ok)
        outs = []
        for e in np.unique(evi[m]):
            for p in (0, 1):
                sel = m & (evi == e) & (ph == p)
                if sel.sum() >= 6:
                    outs.append(np.std(t[sel]))
        return np.median(outs)

    s_corr = spread(L, True)
    s_indep = spread(None, False)
    # fully-correlated noise cancels across co-located stations
    assert s_corr < 0.35 * s_indep, (s_corr, s_indep)


def test_rasterized_featurizer_matches_searchsorted():
    """The rasterized scatter-max featurizer (ref process_utils.py:460-642)
    equals the shared searchsorted featurizer within bin quantization."""
    from genie_tpu.synth.generator import (featurize_window,
                                           featurize_window_rasterized)

    rng = np.random.default_rng(0)
    n_pick, n_sta, n_src = 48, 10, 30
    sig = 3.0
    tpick = jnp.asarray(np.sort(rng.uniform(0, 60, n_pick)).astype(np.float32))
    ipick = jnp.asarray(rng.integers(0, n_sta, n_pick))
    phase = jnp.asarray(rng.integers(0, 2, (n_pick, 1)).astype(np.float32))
    pm = jnp.asarray(rng.uniform(size=n_pick) < 0.9)
    trv = jnp.asarray(rng.uniform(2, 55, (n_src, n_sta, 2)).astype(np.float32))
    trv = trv.at[:, :, 1].set(trv[:, :, 0] * 1.7)
    sta_mask = jnp.ones(n_sta)

    f_ref, m_ref = featurize_window(tpick, ipick, phase, pm, trv, sig, sta_mask)
    f_ras, m_ras = jax.jit(featurize_window_rasterized,
                           static_argnames=("kernel_sig_t", "t_lo", "t_hi"))(
        tpick, ipick, phase, pm, trv, sta_mask=sta_mask, kernel_sig_t=sig,
        t_lo=-20.0, t_hi=120.0)
    assert np.allclose(np.asarray(f_ras), np.asarray(f_ref), atol=0.05)
    assert (np.asarray(m_ras) == np.asarray(m_ref)).mean() > 0.99


def test_preferential_sampling_gates_on_detectable_events():
    """Preferential windows draw only from events whose post-miss picks pass
    the min_sta/min_pick gate and center them at the label-slice center
    (ref train_GENIE_model.py:826-877). A labeled-but-pickless event must
    never be targeted; targeted windows carry a near-max grid label."""
    from genie_tpu.synth.generator import Timeline, make_windows

    cfg = tiny_config()
    cfg.train.n_batch = 16
    cfg.synth.n_sta_range = (1.0, 1.0)       # keep every station
    ctx, tt = tiny_domain(cfg)
    n_sta = cfg.graph.max_sta
    E, N = 2, 64

    # event 0 at t=400 picked by 12 stations; event 1 at t=150 pickless
    ev_pos = np.zeros((E, 3), np.float32)
    ev_pos[:, 2] = -8e3
    ev_time = np.array([400.0, 150.0], np.float32)
    n_pk = 12
    trv = np.asarray(tt.from_cart(jnp.asarray(ctx.sta_cart),
                                  jnp.asarray(ev_pos)))   # (E, n_sta, 2)
    pick_t = np.zeros(N, np.float32)
    pick_sta = np.zeros(N, np.int32)
    pick_event = np.full(N, -1, np.int32)
    pick_mask = np.zeros(N, bool)
    pick_t[:n_pk] = ev_time[0] + trv[0, :n_pk, 0]
    pick_sta[:n_pk] = np.arange(n_pk)
    pick_event[:n_pk] = 0
    pick_mask[:n_pk] = True
    tl = Timeline(jnp.asarray(ev_pos), jnp.asarray(ev_time),
                  jnp.zeros(E), jnp.asarray([True, True]),
                  jnp.asarray(pick_t), jnp.asarray(pick_sta),
                  jnp.zeros(N, jnp.int32), jnp.asarray(pick_event),
                  jnp.asarray(pick_mask), jnp.asarray(pick_mask))

    wb = make_windows(jax.random.PRNGKey(3), cfg.synth, cfg.train, cfg.graph,
                      tl, ctx.sta_cart, ctx.grids_cart, ctx.trv_grids,
                      ctx.scale_cart, ctx.offset_cart,
                      t_win=cfg.model.t_win)
    t0s = np.asarray(wb.t_sample)
    lbl_max = np.asarray(wb.lbl_grid).max(axis=(1, 2))
    near_a = np.abs(t0s - ev_time[0]) < 6.0
    near_b = np.abs(t0s - ev_time[1]) < 20.0
    # ~half the windows target the detectable event, none the pickless one
    assert near_a.sum() >= 4, (t0s, ev_time)
    assert not near_b.any(), (t0s, ev_time)
    # targeted windows carry a strong grid label (spatial taper only)
    assert lbl_max[near_a].max() > 0.5, lbl_max


def test_sensitivity_loss_optional_regularizer():
    """The optional location-covariance regularizer (ref train_GENIE_model.
    py:1792-1829): off by default (identical total), on -> finite extra term
    with gradients flowing into the association head."""
    from genie_tpu.train.trainer import generate_batch, loss_fn

    cfg = tiny_config()
    ctx, tt = tiny_domain(cfg)
    model = Detector(src_chunk=5)
    state = init_train_state(model, cfg, ctx, tt.from_cart, jax.random.PRNGKey(0))
    wb = generate_batch(jax.random.PRNGKey(5), cfg, ctx, tt.from_cart)

    base, _ = loss_fn(model, state.params, ctx, cfg, wb, tt.from_cart)
    cfg.train.sensitivity_weight = 2e-6  # the reference's weight
    on, _ = loss_fn(model, state.params, ctx, cfg, wb, tt.from_cart)
    assert np.isfinite(float(on))
    assert float(on) >= float(base)  # a penalty, never a reward
    g = jax.grad(lambda p: loss_fn(model, p, ctx, cfg, wb, tt.from_cart)[0])(
        state.params)
    gn = jax.tree_util.tree_reduce(lambda a, x: a + float(jnp.abs(x).sum()), g, 0.0)
    assert np.isfinite(gn) and gn > 0


def test_legacy_travel_times_mask_branches():
    """LegacyTravelTimes (ref module.py:1190-1321): dual-branch time +
    sigmoid validity mask, relative-only variants, and train-time random
    dropping of the absolute branch."""
    from genie_tpu.models.travel_time import LegacyTravelTimes

    rng = np.random.default_rng(0)
    sta = rng.uniform(-50e3, 50e3, (7, 3)).astype(np.float32)
    src = rng.uniform(-80e3, 80e3, (11, 3)).astype(np.float32)
    m = LegacyTravelTimes(n_phases=2)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(sta), jnp.asarray(src))
    t, mask = m.apply(params, jnp.asarray(sta), jnp.asarray(src))
    assert t.shape == (11, 7, 2) and mask.shape == (11, 7, 2)
    assert (np.asarray(mask) > 0).all() and (np.asarray(mask) < 1).all()
    # relative-only path differs from the full path (fc2/fc4 contribute)
    t_rel, mask_rel = m.apply(params, jnp.asarray(sta), jnp.asarray(src),
                              relative=True)
    assert not np.allclose(np.asarray(t), np.asarray(t_rel))
    # train-time drop: with drop_p=1 the absolute branch is fully dropped,
    # reproducing the relative path exactly (ref forward_train semantics)
    t_tr, mask_tr = m.apply(params, jnp.asarray(sta), jnp.asarray(src),
                            train=True, drop_p=1.0,
                            rngs={"dropout": jax.random.PRNGKey(1)})
    np.testing.assert_allclose(np.asarray(t_tr), np.asarray(t_rel), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mask_tr), np.asarray(mask_rel), atol=1e-6)
    # and the mask head is trainable: one gradient step moves it
    def loss(p):
        _, mk = m.apply(p, jnp.asarray(sta), jnp.asarray(src))
        return ((mk - 1.0) ** 2).mean()
    g = jax.grad(loss)(params)
    gn = jax.tree_util.tree_reduce(lambda a, x: a + float(jnp.abs(x).sum()), g, 0.0)
    assert np.isfinite(gn) and gn > 0


def test_dataset_prebuild_roundtrip(tmp_path):
    """Dataset pre-build mode (ref train_GENIE_model.py:1411-1504): two
    interleaved jobs write disjoint stripes atomically, the loader restores
    byte-identical batches, and a training step consumes them."""
    from genie_tpu.train.trainer import (build_training_dataset,
                                         load_training_batch,
                                         make_train_step_from_batch)

    cfg = tiny_config()
    ctx, tt = tiny_domain(cfg)
    w0 = build_training_dataset(cfg, ctx, tt.from_cart, tmp_path, 4,
                                seed=7, job=0, n_jobs=2)
    w1 = build_training_dataset(cfg, ctx, tt.from_cart, tmp_path, 4,
                                seed=7, job=1, n_jobs=2)
    names = sorted(p.name for p in (*w0, *w1))
    assert names == [f"training_batch_{i}.npz" for i in range(4)]
    # idempotent restart: nothing rewritten
    again = build_training_dataset(cfg, ctx, tt.from_cart, tmp_path, 4,
                                   seed=7, job=0, n_jobs=2)
    assert sorted(p.name for p in again) == sorted(p.name for p in w0)

    wb = load_training_batch(tmp_path / "training_batch_0.npz")
    fresh = jax.jit(lambda k: __import__("genie_tpu.train.trainer",
                                         fromlist=["generate_batch"])
                    .generate_batch(k, cfg, ctx, tt.from_cart))(
        jax.random.fold_in(jax.random.PRNGKey(7), 0))
    for f in wb._fields:
        np.testing.assert_array_equal(np.asarray(getattr(wb, f)),
                                      np.asarray(getattr(fresh, f)), err_msg=f)

    model = Detector(src_chunk=5)
    state = init_train_state(model, cfg, ctx, tt.from_cart, jax.random.PRNGKey(0))
    step, _ = make_train_step_from_batch(model, cfg, ctx, tt.from_cart)
    state, metrics = step(state, wb)
    assert np.isfinite(float(metrics["loss"]))


def test_clean_data_interval_carves_false_picks():
    """use_clean_data_interval (ref train_GENIE_model.py:748-755): one
    random contiguous stretch of the window must lose its (non-spike) false
    picks, so the kept false count drops roughly by the carved fraction."""
    from genie_tpu.synth.generator import synthesize_timeline

    def run(enabled):
        cfg = tiny_config()
        cfg.synth.use_clean_data_interval = enabled
        cfg.synth.clean_interval_frac = (0.5, 0.5)
        cfg.synth.coda_rate = 0.0  # coda picks also carry event id -1
        cfg.synth.max_rate_events = 200.0  # enough true picks to seed falses
        ctx, tt = tiny_domain(cfg)
        tl = synthesize_timeline(
            jax.random.PRNGKey(0), cfg.synth, ctx.sta_cart, tt.from_cart,
            ctx.scale_cart, ctx.offset_cart,
            (ctx.offset_cart[2], ctx.offset_cart[2] + ctx.scale_cart[2]),
            n_sta_real=ctx.sta_cart.shape[0])
        m = np.asarray(tl.pick_mask) & (np.asarray(tl.pick_event) == -1)
        return np.asarray(tl.pick_t)[m]

    t_off, t_on = run(False), run(True)
    assert len(t_on) > 0
    # carved run keeps clearly fewer false picks (50% carve, spikes exempt)
    assert len(t_on) < 0.8 * len(t_off)
