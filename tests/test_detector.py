import pytest
import numpy as np
import jax
import jax.numpy as jnp

from genie_tpu.models.detector import Detector, GraphBundle, PickSet, QuerySet
from genie_tpu.graphs.build import (
    build_pair_table,
    build_query_attachment,
    build_station_graph,
    build_source_graph,
    build_time_pointers,
)


def make_tiny_scene(seed=0, n_sta=12, n_src=40, n_pick=24, n_q=17, n_qsrc=9, n_t=5):
    rng = np.random.default_rng(seed)
    sta_pos = rng.uniform(-50e3, 50e3, (n_sta, 3)).astype(np.float32)
    sta_pos[:, 2] = rng.uniform(-2e3, 1e3, n_sta)
    src_pos = rng.uniform(-60e3, 60e3, (n_src, 3)).astype(np.float32)
    src_pos[:, 2] = rng.uniform(-30e3, 0, n_src)

    vp, vs = 5500.0, 3100.0
    d = np.linalg.norm(src_pos[:, None] - sta_pos[None], axis=-1)
    trv = np.stack((d / vp, d / vs), -1).astype(np.float32)

    sta_mask = np.ones(n_sta, bool)
    sta_mask[-2:] = False
    sta_nbr, sta_valid = build_station_graph(sta_pos, 4, jnp.asarray(sta_mask))
    src_nbr = build_source_graph(src_pos, 6)
    ptr_p, ptr_s, dt0, dt, n_dt = build_time_pointers(trv, dt=1.0, k=5, win=10.0)

    edge_feat = ((src_pos[:, None] - sta_pos[None]) / 100e3).astype(np.float32)

    feat = rng.random((n_src, n_sta, 4)).astype(np.float32) * 0.5
    mask = (feat > 0.2).astype(np.float32)
    feat = feat * sta_mask[None, :, None]
    mask = mask * sta_mask[None, :, None]

    tpick = rng.uniform(0, 40, n_pick).astype(np.float32)
    ipick = rng.integers(0, n_sta - 2, n_pick).astype(np.int32)
    phase = rng.integers(0, 2, (n_pick, 1)).astype(np.float32)
    pick_mask = np.ones(n_pick, bool)
    pick_mask[-3:] = False
    pair_idx, pair_valid = build_pair_table(
        jnp.asarray(tpick), jnp.asarray(ipick), jnp.asarray(pick_mask), k_pair=5)

    x_query = rng.uniform(-60e3, 60e3, (n_q, 3)).astype(np.float32)
    x_qsrc = rng.uniform(-60e3, 60e3, (n_qsrc, 3)).astype(np.float32)
    xq_idx = build_query_attachment(src_pos, x_query, k=5)
    xqs_idx = build_query_attachment(src_pos, x_qsrc, k=5)
    t_query = np.linspace(-5, 5, n_t).reshape(-1, 1).astype(np.float32)
    tq_sample = rng.uniform(0, 10, n_qsrc).astype(np.float32)
    dq = np.linalg.norm(x_qsrc[:, None] - sta_pos[None], axis=-1)
    trv_q = np.stack((dq / vp, dq / vs), -1).astype(np.float32)

    graph = GraphBundle(
        sta_nbr=sta_nbr, sta_nbr_valid=sta_valid, src_nbr=src_nbr,
        sta_mask=jnp.asarray(sta_mask), edge_feat=jnp.asarray(edge_feat),
        src_pos=jnp.asarray(src_pos), time_ptr_p=ptr_p, time_ptr_s=ptr_s,
        dt0=jnp.float32(dt0), dt=jnp.float32(dt), trv=jnp.asarray(trv),
    )
    picks = PickSet(
        tpick=jnp.asarray(tpick), ipick=jnp.asarray(ipick),
        phase=jnp.asarray(phase), mask=jnp.asarray(pick_mask),
        pair_idx=pair_idx, pair_valid=pair_valid,
    )
    queries = QuerySet(
        x_query=jnp.asarray(x_query), x_query_idx=xq_idx,
        t_query=jnp.asarray(t_query), x_qsrc=jnp.asarray(x_qsrc),
        x_qsrc_idx=xqs_idx, tq_sample=jnp.asarray(tq_sample),
        trv_qsrc=jnp.asarray(trv_q),
    )
    return jnp.asarray(feat), jnp.asarray(mask), graph, jnp.asarray(sta_pos), picks, queries


def test_detector_forward_shapes_and_grad():
    feat, mask, graph, sta_pos, picks, queries = make_tiny_scene()
    model = Detector(src_chunk=4)
    params = model.init(jax.random.PRNGKey(0), feat, mask, graph, sta_pos, picks, queries)

    @jax.jit
    def fwd(p):
        return model.apply(p, feat, mask, graph, sta_pos, picks, queries)

    y, x, arv_p, arv_s = fwd(params)
    assert y.shape == (40, 5, 1)
    assert x.shape == (17, 5, 1)
    assert arv_p.shape == (9, 24, 1) and arv_s.shape == (9, 24, 1)
    for t in (y, x, arv_p, arv_s):
        assert np.isfinite(np.asarray(t)).all()

    def loss(p):
        y, x, ap, as_ = model.apply(p, feat, mask, graph, sta_pos, picks, queries)
        return (y**2).mean() + (x**2).mean() + (ap**2).mean() + (as_**2).mean()

    g = jax.jit(jax.grad(loss))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # gradient reaches the first layer
    flat = jax.tree_util.tree_flatten_with_path(g)[0]
    got_nonzero = any(
        np.abs(np.asarray(v)).max() > 0
        for p, v in flat
        if "data_agg" in jax.tree_util.keystr(p)
    )
    assert got_nonzero


@pytest.mark.slow
def test_detection_only_matches_full_forward():
    feat, mask, graph, sta_pos, picks, queries = make_tiny_scene(seed=1)
    model = Detector(src_chunk=4)
    params = model.init(jax.random.PRNGKey(1), feat, mask, graph, sta_pos, picks, queries)
    y_full, x_full, _, _ = model.apply(params, feat, mask, graph, sta_pos, picks, queries)
    y_det, x_det = model.apply(
        params, feat, mask, graph, sta_pos,
        queries.x_query, queries.x_query_idx, queries.t_query,
        method=Detector.forward_detection_only,
    )
    assert np.allclose(np.asarray(y_full), np.asarray(y_det), atol=1e-5)
    assert np.allclose(np.asarray(x_full), np.asarray(x_det), atol=1e-5)


def test_padded_stations_do_not_affect_output():
    """Changing features at masked stations must not change any output."""
    feat, mask, graph, sta_pos, picks, queries = make_tiny_scene(seed=2)
    model = Detector(src_chunk=4)
    params = model.init(jax.random.PRNGKey(2), feat, mask, graph, sta_pos, picks, queries)
    y1, x1, p1, s1 = model.apply(params, feat, mask, graph, sta_pos, picks, queries)
    feat2 = np.asarray(feat).copy()
    feat2[:, -2:, :] = 123.0  # masked stations
    y2, x2, p2, s2 = model.apply(params, jnp.asarray(feat2), mask, graph, sta_pos, picks, queries)
    assert np.allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)
    assert np.allclose(np.asarray(x1), np.asarray(x2), atol=1e-5)


def test_padded_picks_do_not_affect_valid_scores():
    feat, mask, graph, sta_pos, picks, queries = make_tiny_scene(seed=3)
    model = Detector(src_chunk=4)
    params = model.init(jax.random.PRNGKey(3), feat, mask, graph, sta_pos, picks, queries)
    _, _, p1, s1 = model.apply(params, feat, mask, graph, sta_pos, picks, queries)
    tp2 = np.asarray(picks.tpick).copy()
    tp2[-3:] = 7.7  # padded picks get new times
    picks2 = picks._replace(tpick=jnp.asarray(tp2))
    _, _, p2, s2 = model.apply(params, feat, mask, graph, sta_pos, picks2, queries)
    valid = np.asarray(picks.mask)
    assert np.allclose(np.asarray(p1)[:, valid], np.asarray(p2)[:, valid], atol=1e-5)


def test_via_matmul_matches_gather_path():
    """The MXU matmul aggregation option must be numerically equivalent."""
    feat, mask, graph, sta_pos, picks, queries = make_tiny_scene(seed=4)
    m1 = Detector(src_chunk=4, via_matmul=False)
    m2 = Detector(src_chunk=4, via_matmul=True)
    params = m1.init(jax.random.PRNGKey(4), feat, mask, graph, sta_pos, picks, queries)
    o1 = m1.apply(params, feat, mask, graph, sta_pos, picks, queries)
    o2 = m2.apply(params, feat, mask, graph, sta_pos, picks, queries)
    for a, b in zip(o1, o2):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_mean_rel_pos_embed_matches_explicit_edge_mean():
    """The dense per-receiver table must equal the explicit per-edge
    mean of sign(Δ)·exp(−Δ²/2σ²) over (Δxyz, ‖Δ‖) — the exact reduction of
    the reference's DataAggregationEdges message (module.py:1059-1072)."""
    from genie_tpu.models.layers import mean_rel_pos_embed

    rng = np.random.default_rng(3)
    n, k, sig = 9, 4, 30e3
    pos = rng.uniform(-50e3, 50e3, (n, 3)).astype(np.float32)
    nbr = rng.integers(0, n, (n, k))
    valid = rng.random((n, k)) > 0.3
    valid[:, 0] = True
    got = np.asarray(mean_rel_pos_embed(
        jnp.asarray(pos), jnp.asarray(nbr), sig, jnp.asarray(valid)))
    for i in range(n):
        embs = []
        for kk in range(k):
            if not valid[i, kk]:
                continue
            rel = pos[nbr[i, kk]] - pos[i]
            rel4 = np.concatenate((rel, [np.linalg.norm(rel) + 1e-12 * 0]))
            rel4[3] = np.sqrt((rel**2).sum() + 1e-12)
            embs.append(np.sign(rel4) * np.exp(-0.5 * rel4**2 / sig**2))
        np.testing.assert_allclose(got[i], np.mean(embs, axis=0), rtol=2e-5,
                                   atol=2e-6)


def test_updated_model_definition_switches_architecture():
    """use_updated_model_definition must actually change the parameter
    structure (widened conv linears) and produce a trainable forward."""
    feat, mask, graph, sta_pos, picks, queries = make_tiny_scene(seed=5)
    base = Detector(src_chunk=4)
    edges = Detector(src_chunk=4, use_updated_model_definition=True)
    p0 = base.init(jax.random.PRNGKey(0), feat, mask, graph, sta_pos, picks, queries)
    p1 = edges.init(jax.random.PRNGKey(0), feat, mask, graph, sta_pos, picks, queries)

    def width(p, path):
        d = p["params"]
        for k in path:
            d = d[k]
        return d["kernel"].shape[0]

    w0 = width(p0, ("data_agg", "l1_t1_2"))
    w1 = width(p1, ("data_agg", "l1_t1_2"))
    assert w1 == w0 + 4  # Gaussian-embedded (Δxyz, ‖Δ‖) widens the input

    y, x, ap, as_ = jax.jit(edges.apply)(p1, feat, mask, graph, sta_pos,
                                         picks, queries)
    assert np.isfinite(np.asarray(y)).all() and np.isfinite(np.asarray(x)).all()

    def loss(p):
        y, x, ap, as_ = edges.apply(p, feat, mask, graph, sta_pos, picks, queries)
        return (y**2).mean() + (x**2).mean() + (ap**2).mean() + (as_**2).mean()

    g = jax.jit(jax.grad(loss))(p1)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))


def test_readin_sum_preserves_station_count_signal():
    """The raw ('add') bipartite read-in must scale with the number of
    coherent stations — the primary detection signal (ref module.py:214-229).
    The count-normalized variant divides it away; training with it collapsed
    the detection heads to an input-independent background on the 374-station
    NC network, so the raw sum is the default."""
    from genie_tpu.models.layers import BipartiteReadIn

    n_src, n_sta, c = 6, 40, 30
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((n_src, n_sta, c)), jnp.float32)
    edge = jnp.asarray(rng.random((n_src, n_sta, 3)), jnp.float32)
    sta_mask = jnp.ones(n_sta)

    def masked(n_active):
        m = np.zeros((n_src, n_sta, 4), np.float32)
        m[:, :n_active] = 1.0
        return jnp.asarray(m)

    layer = BipartiteReadIn(ndim_in=c + 3, ndim_out=15, normalize=False)
    params = layer.init(jax.random.PRNGKey(0), x, edge, masked(n_sta), sta_mask)
    # pre-activation magnitude after the station sum grows with the count
    few = layer.apply(params, x, edge, masked(4), sta_mask)
    many = layer.apply(params, x, edge, masked(40), sta_mask)
    assert float(jnp.abs(many).mean()) > 3.0 * float(jnp.abs(few).mean())

    norm = BipartiteReadIn(ndim_in=c + 3, ndim_out=15, normalize=True)
    params_n = norm.init(jax.random.PRNGKey(0), x, edge, masked(n_sta), sta_mask)
    few_n = norm.apply(params_n, x, edge, masked(4), sta_mask)
    many_n = norm.apply(params_n, x, edge, masked(40), sta_mask)
    # the normalized variant erases the count signal (this is the failure)
    ratio = float(jnp.abs(many_n).mean()) / float(jnp.abs(few_n).mean())
    assert 0.5 < ratio < 2.0


def test_normalize_readin_config_roundtrip(tmp_path):
    from genie_tpu.config import Config, load_config

    cfg = Config()
    assert cfg.model.normalize_readin is False  # reference default
    cfg.model.normalize_readin = True
    cfg.save(tmp_path / "c.yaml")
    assert load_config(tmp_path / "c.yaml").model.normalize_readin is True
