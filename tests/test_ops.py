import numpy as np
import jax.numpy as jnp

from genie_tpu.ops.knn import knn, knn_graph, knn_tiled
from genie_tpu.ops.segment import (
    gather_mean,
    gather_mean_src_axis,
    gather_mean_sta_axis,
    gather_sum,
    segment_mean,
    segment_softmax,
    spmm,
)


def _brute_knn(xc, xq, k):
    d = ((xq[:, None, :] - xc[None, :, :]) ** 2).sum(-1)
    return np.argsort(d, axis=1, kind="stable")[:, :k]


def test_knn_matches_bruteforce():
    rng = np.random.default_rng(0)
    xc = rng.normal(size=(200, 3)).astype(np.float32)
    xq = rng.normal(size=(50, 3)).astype(np.float32)
    idx, valid = knn(xc, xq, 5)
    want = _brute_knn(xc, xq, 5)
    # compare distances (ties may reorder indices)
    d_got = np.sort(((xq[:, None] - xc[np.asarray(idx)]) ** 2).sum(-1), axis=1)
    d_want = np.sort(((xq[:, None] - xc[want]) ** 2).sum(-1), axis=1)
    assert np.allclose(d_got, d_want, rtol=1e-4)
    assert np.asarray(valid).all()


def test_knn_respects_mask():
    rng = np.random.default_rng(1)
    xc = rng.normal(size=(100, 3)).astype(np.float32)
    xq = xc[:10]
    mask = np.zeros(100, bool)
    mask[50:] = True
    idx, valid = knn(xc, xq, 4, context_mask=jnp.asarray(mask))
    assert np.asarray(idx).min() >= 50
    assert np.asarray(valid).all()


def test_knn_fewer_valid_than_k():
    xc = np.zeros((10, 3), np.float32)
    xc[:3] = np.arange(3)[:, None]
    mask = np.zeros(10, bool)
    mask[:3] = True
    idx, valid = knn(xc, np.zeros((2, 3), np.float32), 5, context_mask=jnp.asarray(mask))
    v = np.asarray(valid)
    assert v[:, :3].all() and not v[:, 3:].any()
    assert np.asarray(idx).max() < 3  # invalid slots repeat a valid index


def test_knn_graph_excludes_self():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(60, 3)).astype(np.float32)
    nbr, valid = knn_graph(x, 8)
    n = np.asarray(nbr)
    assert np.asarray(valid).all()
    assert not np.any(n == np.arange(60)[:, None])


def test_knn_tiled_matches_knn():
    rng = np.random.default_rng(3)
    xc = rng.normal(size=(1000, 3)).astype(np.float32)
    xq = rng.normal(size=(37, 3)).astype(np.float32)
    i1, _ = knn(xc, xq, 7)
    i2, _ = knn_tiled(xc, xq, 7, tile=256)
    d1 = np.sort(((xq[:, None] - xc[np.asarray(i1)]) ** 2).sum(-1), axis=1)
    d2 = np.sort(((xq[:, None] - xc[np.asarray(i2)]) ** 2).sum(-1), axis=1)
    assert np.allclose(d1, d2, rtol=1e-4)


def test_spmm_matches_dense():
    rng = np.random.default_rng(4)
    n, e, c = 50, 400, 8
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    x = rng.normal(size=(n, c)).astype(np.float32)
    a = np.zeros((n, n), np.float32)
    for s, d in zip(src, dst):
        a[d, s] += 1.0
    want = a @ x
    got = np.asarray(spmm(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(x), n))
    assert np.allclose(got, want, atol=1e-4)


def test_segment_mean_and_softmax():
    ids = np.array([0, 0, 1, 3, 3, 3])
    data = np.array([1.0, 3.0, 5.0, 1.0, 1.0, 4.0], np.float32)
    m = np.asarray(segment_mean(jnp.asarray(data), jnp.asarray(ids), 4))
    assert np.allclose(m, [2.0, 5.0, 0.0, 2.0])
    sm = np.asarray(segment_softmax(jnp.asarray(data), jnp.asarray(ids), 4))
    # within-segment sums to 1
    assert np.isclose(sm[:2].sum(), 1.0) and np.isclose(sm[2], 1.0)
    assert np.isclose(sm[3:].sum(), 1.0)


def test_gather_mean_vs_spmm():
    """The dense fixed-k path must agree with the edge-list path."""
    rng = np.random.default_rng(5)
    n, k, c = 40, 6, 5
    x = rng.normal(size=(n, c)).astype(np.float32)
    nbr = rng.integers(0, n, size=(n, k))
    src = nbr.reshape(-1)
    dst = np.repeat(np.arange(n), k)
    want = np.asarray(spmm(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(x), n, aggr="mean"))
    got = np.asarray(gather_mean(jnp.asarray(x), jnp.asarray(nbr)))
    assert np.allclose(got, want, atol=1e-5)
    got_sum = np.asarray(gather_sum(jnp.asarray(x), jnp.asarray(nbr)))
    want_sum = np.asarray(spmm(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(x), n, aggr="sum"))
    assert np.allclose(got_sum, want_sum, atol=1e-4)


def test_product_axis_aggregation_vs_edge_list():
    """Dense (n_src, n_sta, C) axis aggregation == reference's product-graph
    edge arithmetic (A_sta_sta ⊗ I and I ⊗ A_src_src) done with spmm."""
    rng = np.random.default_rng(6)
    n_src, n_sta, k_sta, k_src, c = 7, 9, 3, 2, 4
    feat = rng.normal(size=(n_src, n_sta, c)).astype(np.float32)
    sta_nbr = np.stack([rng.choice(n_sta, k_sta, replace=False) for _ in range(n_sta)])
    src_nbr = np.stack([rng.choice(n_src, k_src, replace=False) for _ in range(n_src)])

    # product node id = isrc * n_sta + ista (reference layout,
    # train_GENIE_model.py:1145-1149)
    flat = feat.reshape(n_src * n_sta, c)

    # A_prod_sta_sta: (isrc*n_sta + nbr_sta) -> (isrc*n_sta + ista)
    src_e, dst_e = [], []
    for isrc in range(n_src):
        for ista in range(n_sta):
            for kk in range(k_sta):
                src_e.append(isrc * n_sta + sta_nbr[ista, kk])
                dst_e.append(isrc * n_sta + ista)
    want = np.asarray(
        spmm(jnp.asarray(src_e), jnp.asarray(dst_e), jnp.asarray(flat), n_src * n_sta, aggr="mean")
    ).reshape(n_src, n_sta, c)
    got = np.asarray(gather_mean_sta_axis(jnp.asarray(feat), jnp.asarray(sta_nbr)))
    assert np.allclose(got, want, atol=1e-5)

    # A_prod_src_src: (nbr_src*n_sta + ista) -> (isrc*n_sta + ista)
    src_e, dst_e = [], []
    for isrc in range(n_src):
        for ista in range(n_sta):
            for kk in range(k_src):
                src_e.append(src_nbr[isrc, kk] * n_sta + ista)
                dst_e.append(isrc * n_sta + ista)
    want = np.asarray(
        spmm(jnp.asarray(src_e), jnp.asarray(dst_e), jnp.asarray(flat), n_src * n_sta, aggr="mean")
    ).reshape(n_src, n_sta, c)
    got = np.asarray(gather_mean_src_axis(jnp.asarray(feat), jnp.asarray(src_nbr)))
    assert np.allclose(got, want, atol=1e-5)


def test_masked_axis_aggregation():
    rng = np.random.default_rng(7)
    feat = rng.normal(size=(4, 6, 3)).astype(np.float32)
    sta_nbr = np.stack([rng.choice(6, 3, replace=False) for _ in range(6)])
    valid = rng.random((6, 3)) > 0.4
    valid[:, 0] = True
    got = np.asarray(gather_mean_sta_axis(jnp.asarray(feat), jnp.asarray(sta_nbr), jnp.asarray(valid)))
    for i in range(6):
        sel = sta_nbr[i][valid[i]]
        want = feat[:, sel, :].mean(axis=1)
        assert np.allclose(got[:, i, :], want, atol=1e-5)


def test_matmul_aggregation_matches_gather():
    from genie_tpu.ops.segment import (
        aggregation_matrix, matmul_mean_sta_axis, matmul_mean_src_axis)
    rng = np.random.default_rng(8)
    n_src, n_sta, k_sta, k_src, c = 10, 12, 4, 3, 6
    feat = rng.normal(size=(n_src, n_sta, c)).astype(np.float32)
    sta_nbr = np.stack([rng.choice(n_sta, k_sta, replace=False) for _ in range(n_sta)])
    src_nbr = np.stack([rng.choice(n_src, k_src, replace=False) for _ in range(n_src)])
    valid = rng.random((n_sta, k_sta)) > 0.3
    valid[:, 0] = True

    a_sta = aggregation_matrix(jnp.asarray(sta_nbr), n_sta, jnp.asarray(valid))
    got = np.asarray(matmul_mean_sta_axis(jnp.asarray(feat), a_sta))
    want = np.asarray(gather_mean_sta_axis(jnp.asarray(feat), jnp.asarray(sta_nbr), jnp.asarray(valid)))
    assert np.allclose(got, want, atol=1e-5)

    a_src = aggregation_matrix(jnp.asarray(src_nbr), n_src)
    got = np.asarray(matmul_mean_src_axis(jnp.asarray(feat), a_src))
    want = np.asarray(gather_mean_src_axis(jnp.asarray(feat), jnp.asarray(src_nbr)))
    assert np.allclose(got, want, atol=1e-5)


def test_natural_neighbor_interp_properties():
    """NNInterp parity (ref process_utils.py:1543-1629): Sibson-style
    volume-stealing interpolation — exact on constants, node-value
    reproducing at the nodes, symmetric-average midway between two nodes,
    and close to linear fields on a regular cloud."""
    import numpy as np
    import jax.numpy as jnp
    from genie_tpu.ops.interp import natural_neighbor_interp

    rng = np.random.default_rng(0)
    ref = rng.uniform(0, 100.0, (200, 3)).astype(np.float32)

    # constant field -> exact constant everywhere
    q = rng.uniform(10, 90, (20, 3)).astype(np.float32)
    out = np.asarray(natural_neighbor_interp(ref, np.full(200, 3.5), q))
    assert np.allclose(out, 3.5, atol=1e-5)

    # query exactly at a node -> that node's value dominates
    vals = rng.normal(size=200).astype(np.float32)
    out = np.asarray(natural_neighbor_interp(ref, vals, ref[:5], n_res=9))
    assert np.abs(out - vals[:5]).max() < 0.45 * np.abs(vals).max()

    # two isolated nodes, query midway -> average (symmetry)
    ref2 = np.array([[0, 0, 0], [10, 0, 0]], np.float32)
    v2 = np.array([1.0, 3.0], np.float32)
    mid = np.array([[5.0, 0, 0]], np.float32)
    out = float(natural_neighbor_interp(ref2, v2, mid, n_res=11, dx=1.0)[0])
    assert abs(out - 2.0) < 0.2

    # linear field on a jittered grid -> small relative error
    g = np.stack(np.meshgrid(*[np.linspace(0, 60, 7)] * 3,
                             indexing="ij"), -1).reshape(-1, 3)
    g = (g + rng.normal(0, 1.0, g.shape)).astype(np.float32)
    lin = (0.3 * g[:, 0] - 0.2 * g[:, 1] + 0.1 * g[:, 2]).astype(np.float32)
    q = rng.uniform(15, 45, (30, 3)).astype(np.float32)
    want = 0.3 * q[:, 0] - 0.2 * q[:, 1] + 0.1 * q[:, 2]
    out = np.asarray(natural_neighbor_interp(g, lin, q))
    assert np.abs(out - want).max() < 1.5

    # matrix-valued field keeps trailing channels
    vals_c = rng.normal(size=(200, 4)).astype(np.float32)
    out = np.asarray(natural_neighbor_interp(ref, vals_c, q[:4]))
    assert out.shape == (4, 4)
