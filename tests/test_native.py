"""C++ host-kernel tests: parity with the numpy/scipy reference paths."""

import numpy as np
import pytest

native = pytest.importorskip("gcpnet_tpu.data.native")


def _edge_set(s, r):
    return set(zip(s.tolist(), r.tolist()))


def test_radius_graph_matches_scipy(rng):
    try:
        s_n, r_n = native.radius_graph_native(
            rng.normal(size=(50, 3)).astype(np.float32) * 3, 2.5, 32
        )
    except Exception as exc:
        pytest.skip(f"native kernels unavailable: {exc}")

    coords = rng.normal(size=(80, 3)).astype(np.float32) * 3
    s_n, r_n = native.radius_graph_native(coords, 2.5, 32)

    # brute-force reference
    d = np.linalg.norm(coords[:, None] - coords[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    expected = set()
    for i in range(coords.shape[0]):
        nbrs = np.where(d[i] <= 2.5)[0]
        nbrs = nbrs[np.argsort(d[i, nbrs])][:32]
        for j in nbrs:
            expected.add((int(j), i))
    assert _edge_set(s_n, r_n) == expected


def test_knn_native_matches_numpy(rng):
    from gcpnet_tpu.data.protein_graph import knn_graph

    coords = rng.normal(size=(40, 3)).astype(np.float32) * 4
    valid = rng.random(40) > 0.15
    try:
        s_n, r_n = native.knn_graph_native(coords, 6, valid=valid)
    except Exception as exc:
        pytest.skip(f"native kernels unavailable: {exc}")
    s_p, r_p = knn_graph(np.where(valid[:, None], coords, np.inf), 6, valid)
    assert _edge_set(s_n, r_n) == _edge_set(s_p, r_p)


def test_hybrid_knn_native_matches_numpy(rng):
    from gcpnet_tpu.data.ar import hybrid_knn_edges

    coords = rng.normal(size=(30, 3)).astype(np.float32) * 4
    try:
        s_n, r_n = native.hybrid_knn_graph_native(coords, 3, 8)
    except Exception as exc:
        pytest.skip(f"native kernels unavailable: {exc}")
    s_p, r_p = hybrid_knn_edges(coords, 3, 8)
    assert _edge_set(s_n, r_n) == _edge_set(s_p, r_p)
