import numpy as np
import jax
import jax.numpy as jnp

from genie_tpu.utils import (
    compute_travel_times_chunked,
    in_hull,
    select_stations_within_pick_budget,
)
from genie_tpu.infer.split import spectral_bisect, split_component
from genie_tpu.graphs.subgraph import pair_mask


def test_in_hull():
    hull = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]], float)
    pts = np.array([[0.3, 0.3, 0.3], [2.0, 2.0, 2.0]])
    got = in_hull(pts, hull)
    assert got[0] and not got[1]


def test_station_budget_selection_is_optimal():
    counts = np.array([10, 1, 5, 3, 8, 2])
    sel = select_stations_within_pick_budget(counts, max_picks=11)
    # optimal subset size: 1+2+3+5 = 11 → 4 stations
    assert len(sel) == 4
    assert counts[sel].sum() <= 11


def test_chunked_travel_times():
    from genie_tpu.geometry import Projection
    from genie_tpu.models.travel_time import HomogeneousTravelTime

    tt = HomogeneousTravelTime(Projection.from_center((40.0, -124.0)))
    rng = np.random.default_rng(0)
    sta = jnp.asarray(rng.normal(size=(7, 3)).astype(np.float32) * 1e4)
    src = jnp.asarray(rng.normal(size=(500, 3)).astype(np.float32) * 1e4)
    full = np.asarray(tt.from_cart(sta, src))
    chunked = compute_travel_times_chunked(tt.from_cart, sta, src, max_chunk=300)
    assert np.allclose(full, chunked, atol=1e-5)


def test_spectral_bisect_two_blobs():
    a = np.zeros((8, 8))
    a[:4, :4] = 1.0
    a[4:, 4:] = 1.0
    a[3, 4] = a[4, 3] = 0.05  # weak bridge
    labels = spectral_bisect(a)
    assert len(set(labels[:4])) == 1 and len(set(labels[4:])) == 1
    assert labels[0] != labels[7]


def test_split_component_caps_sources():
    rng = np.random.default_rng(0)
    n_src, n_pick = 8, 40
    src_pos = np.concatenate((rng.normal(0, 1e3, (4, 3)),
                              rng.normal(50e3, 1e3, (4, 3))))
    src_time = np.concatenate((np.full(4, 10.0), np.full(4, 200.0)))
    ipick = rng.integers(0, 5, n_pick)
    w = np.zeros((n_src, n_pick, 2))
    w[:4, :20, 0] = 0.5
    w[4:, 20:, 0] = 0.5
    parts = split_component(w, ipick, src_pos, src_time, max_sources=4)
    assert all(len(q) <= 4 for q, p in parts)
    covered = np.concatenate([q for q, p in parts])
    assert sorted(covered.tolist()) == list(range(8))


def test_pair_mask_subgraph():
    rng = np.random.default_rng(1)
    src = np.stack((rng.uniform(39, 41, 20), rng.uniform(-125, -123, 20),
                    rng.uniform(-30e3, 0, 20)), 1)
    sta = np.stack((rng.uniform(39, 41, 10), rng.uniform(-125, -123, 10),
                    np.zeros(10)), 1)
    m = np.asarray(pair_mask(jnp.asarray(src), jnp.asarray(sta),
                             max_deg_offset=0.5, k_nearest_pairs=3))
    assert m.shape == (20, 10)
    # every source keeps at least its 3 nearest stations
    assert (m.sum(axis=1) >= 3).all()


def test_pick_and_catalog_io(tmp_path):
    from genie_tpu.io import (
        export_hypodd_phase, load_catalog, load_picks, save_catalog, save_picks)
    from genie_tpu.infer.pipeline import CatalogEvent

    t = np.array([1.5, 2.5, 100.0])
    sta = np.array([0, 2, 1])
    ph = np.array([0.0, 1.0, 0.0])
    save_picks(tmp_path / "p.npz", t, sta, ph)
    t2, s2, p2, a2 = load_picks(tmp_path / "p.npz")
    assert np.allclose(t2, t) and (s2 == sta).all() and np.allclose(p2, ph)

    events = [CatalogEvent(pos_cart=np.array([1e3, 2e3, -5e3]), time=50.0,
                           picks=np.array([0, 1]), pick_phases=np.array([0, 1]),
                           cov=np.eye(4), mag=2.5)]
    save_catalog(tmp_path / "c.hdf5", events, pick_t=t, pick_sta=sta)
    back = load_catalog(tmp_path / "c.hdf5")
    assert len(back) == 1
    assert np.allclose(back[0].pos_cart, events[0].pos_cart)
    assert back[0].mag == 2.5
    assert (back[0].picks == events[0].picks).all()

    export_hypodd_phase(tmp_path / "ph.txt", events, t, sta,
                        ["STA0", "STA1", "STA2"])
    txt = (tmp_path / "ph.txt").read_text()
    assert "STA0" in txt and txt.startswith("#")


def test_checkpoint_roundtrip(tmp_path):
    from genie_tpu.io import load_checkpoint, save_checkpoint
    from genie_tpu.train.trainer import TrainState

    params = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    state = TrainState(params=params, opt_state={"m": np.zeros(3, np.float32)},
                       step=np.int32(7))
    save_checkpoint(tmp_path / "ckpt", state)
    restored = load_checkpoint(tmp_path / "ckpt", state)
    assert int(restored.step) == 7
    assert np.allclose(restored.params["w"], params["w"])


def test_hypodd_catalog_conversion(tmp_path):
    """HypoDD catalog.txt → per-day Catalog hdf5 (ref make_initial_files.py:
    163-283): parse, group by day, amplitude-match against Picks/, roundtrip
    through load_catalog."""
    from genie_tpu.config import Config
    from genie_tpu.geometry import Projection
    from genie_tpu.io import load_catalog, project_dirs, save_picks
    from genie_tpu.setup.project import (convert_hypodd_catalog,
                                         parse_hypodd_catalog)

    cfg = Config()
    cfg.region.name = "T"
    sta_names = np.array(["AAA", "BBB", "CCC"])
    dirs = project_dirs(tmp_path, "T")
    catalog = "\n".join([
        "# 2020 1 2 3 4 5.5 40.1 -124.2 7.5 2.1 0.4 0.8 0.1 1",
        "AAA 3.2 0.9 P",
        "BBB 5.9 0.8 S",
        "# 2020 1 2 10 0 0.0 40.3 -124.0 4.0 1.5 0.2 0.2 0.1 2",
        "CCC 2.0 0.7 P",
        "# 2020 1 3 0 0 1.0 40.0 -124.1 10.0 3.0 1.0 1.0 0.1 3",
        "AAA 4.0 0.95 P",
    ])
    (tmp_path / "catalog.txt").write_text(catalog)

    evs = parse_hypodd_catalog(tmp_path / "catalog.txt", sta_names)
    assert len(evs) == 3
    assert evs[0]["date"] == (2020, 1, 2)
    tod0 = 3 * 3600 + 4 * 60 + 5.5
    assert abs(evs[0]["tod"] - tod0) < 1e-6
    assert evs[0]["lla"] == (40.1, -124.2, -7500.0)
    assert abs(evs[0]["sigma_m"] - 600.0) < 1e-6
    assert evs[0]["picks"].shape == (2, 4)
    assert abs(evs[0]["picks"][0, 0] - (tod0 + 3.2)) < 1e-6

    # a Picks file for day 1 containing a matching AAA pick with an amplitude
    save_picks(dirs["picks"] / "2020" / "T_2020_1_2_ver_1.npz",
               np.array([tod0 + 3.4]), np.array([0]), np.array([0.0]),
               amp=np.array([123.0]))

    proj = Projection.from_center((40.0, -124.0))
    days = convert_hypodd_catalog(tmp_path / "catalog.txt", dirs, cfg,
                                  sta_names, proj)
    assert days == ["2020-1-2", "2020-1-3"]
    f1 = (dirs["catalog"] / "2020" /
          "T_results_continuous_days_2020_1_2_ver_1.hdf5")
    cat = load_catalog(f1)
    assert len(cat) == 2
    assert cat[0].mag == 2.1
    assert list(cat[0].picks) == [0, 1]
    assert list(cat[0].pick_phases) == [0, 1]
    assert list(cat[1].picks) == [2]
    import h5py
    with h5py.File(f1, "r") as f:
        assert abs(f.attrs["amp"][0] - 123.0) < 1e-9   # matched within 1 s
        assert f.attrs["amp"][1] == 0.0                # S pick: no match
    # unknown station must raise (reference asserts)
    (tmp_path / "bad.txt").write_text(
        "# 2020 1 2 0 0 0.0 40 -124 5 1 0.1 0.1 0.1 9\nZZZ 1.0 0.5 P")
    import pytest
    with pytest.raises(ValueError):
        parse_hypodd_catalog(tmp_path / "bad.txt", sta_names)
