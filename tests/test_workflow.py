import numpy as np
import jax
import jax.numpy as jnp

from genie_tpu.config import Config
from genie_tpu.setup.project import init_project, load_project
from genie_tpu.workflow import domain_from_project, make_trv, process_day, train


def small_cfg():
    cfg = Config()
    cfg.region.name = "TestProj"
    cfg.graph.n_grids = 2
    cfg.graph.n_spatial_nodes = 60
    cfg.graph.max_sta = 12
    cfg.graph.max_picks = 64
    cfg.graph.k_sta_edges = 4
    cfg.graph.k_spc_edges = 6
    cfg.graph.k_time_edges = 5
    cfg.graph.k_spatial_attn = 5
    cfg.graph.k_pick_pairs = 6
    cfg.train.n_batch = 2
    cfg.train.n_spc_query = 30
    cfg.train.n_src_query = 8
    cfg.train.checkpoint_every = 2
    cfg.synth.max_events = 12
    cfg.synth.n_false_max = 64
    cfg.synth.T = 600.0
    cfg.synth.max_rate_events = 6.0
    cfg.process.thresh = 0.05
    cfg.process.min_required_picks = 3
    cfg.process.min_required_sta = 2
    return cfg


def test_full_project_workflow(tmp_path):
    cfg = small_cfg()
    rng = np.random.default_rng(0)
    n_sta = cfg.graph.max_sta
    sta_lla = np.stack((
        rng.uniform(*cfg.region.lat_range, n_sta),
        rng.uniform(*cfg.region.lon_range, n_sta),
        rng.uniform(0, 1200, n_sta),
    ), axis=1)

    # 1. init project (stations, region, grids)
    dirs, proj, grids = init_project(tmp_path, cfg, sta_lla=sta_lla,
                                     n_steps_grids=60)
    assert (tmp_path / "TestProj_stations.npz").exists()
    assert grids.shape == (2, 60, 3)
    # grids live inside the padded region
    assert grids[..., 0].min() > cfg.region.lat_range_extend[0] - 0.1
    assert grids[..., 0].max() < cfg.region.lat_range_extend[1] + 0.1

    # 2. reload + domain context
    pj = load_project(tmp_path, "TestProj")
    assert pj["sta_lla"].shape == (n_sta, 3)
    ctx, proj2, trv = domain_from_project(tmp_path, cfg)
    assert ctx.trv_grids.shape[:2] == (2, 60)
    assert np.isfinite(np.asarray(ctx.trv_grids)).all()

    # 3. short training run with checkpointing
    model, state = train(cfg, ctx, trv, tmp_path / "GNN_TrainedModels",
                         n_steps=2, log_every=1)
    assert (tmp_path / "GNN_TrainedModels" / "ckpt").exists()
    assert (tmp_path / "GNN_TrainedModels" / "TestProj_output_ver_1.txt").exists()

    # 4. fabricate a pick file from a planted event and process it
    from genie_tpu.io import load_catalog, save_picks
    sta_cart = np.asarray(ctx.sta_cart)
    true_pos = sta_cart.mean(axis=0) + np.array([5e3, -5e3, -10e3], np.float32)
    trv_ev = np.asarray(trv.from_cart(ctx.sta_cart, jnp.asarray(true_pos[None])))[0]
    t_ev = 100.0
    times = np.concatenate((t_ev + trv_ev[:, 0], t_ev + trv_ev[:, 1]))
    stas = np.concatenate((np.arange(n_sta), np.arange(n_sta)))
    phases = np.concatenate((np.zeros(n_sta), np.ones(n_sta)))
    save_picks(tmp_path / "picks_day.npz", times, stas, phases)

    events = process_day(cfg, ctx, trv, model, state.params,
                         tmp_path / "picks_day.npz",
                         tmp_path / "catalog_day.hdf5",
                         t_start=60.0, t_end=200.0)
    # untrained model → no guarantee of detection, but the file must exist
    # and reload cleanly
    back = load_catalog(tmp_path / "catalog_day.hdf5")
    assert len(back) == len(events)
