"""Dense fixed-degree receiver layout: identical numerics to the edge-list
layout, no scatters on the aggregation path.

The dense layout (data.batching.densify_edges_by_receiver) re-lays each
shard's edges so row ``n*K + j`` is receiver ``n``'s j-th incoming edge;
receiver-side gathers become broadcasts and receiver-side segment
reductions become [N, K, C] axis-1 sums.  Parity target: the reference's
torch_scatter aggregation (gcpnet.py:938-947) — same math, different
summation order, so fp32 agreement to ~1e-5.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gcpnet_tpu.config.schema import LayerCfg, MPCfg, ModelCfg, ModuleCfg
from gcpnet_tpu.data.batching import (
    Bucket,
    collate_shards,
    densify_edges_by_receiver,
)
from gcpnet_tpu.graph import GraphData
from gcpnet_tpu.models import GCPNetLBA, GCPNetNMS, graph_regression_loss


def _random_graph(rng, n=20, deg_max=6):
    # in-degree-capped edges, like the native radius/knn builders
    senders, receivers = [], []
    for i in range(n):
        deg = int(rng.integers(2, deg_max + 1))
        js = rng.choice([j for j in range(n) if j != i], size=deg, replace=False)
        senders.extend(js)
        receivers.extend([i] * deg)
    e = len(senders)
    return GraphData(
        h=rng.integers(0, 9, size=n).astype(np.int32),
        chi=rng.normal(size=(n, 2, 3)).astype(np.float32),
        e=rng.normal(size=(e, 16)).astype(np.float32),
        xi=rng.normal(size=(e, 1, 3)).astype(np.float32),
        x=(rng.normal(size=(n, 3)) * 4).astype(np.float32),
        senders=np.asarray(senders, np.int32),
        receivers=np.asarray(receivers, np.int32),
        extras={"label": np.float32(rng.normal()),
                "edge_tag": rng.normal(size=(e,)).astype(np.float32)},
    )


def _batches(rng, num_graphs=2, n=20, deg_max=6):
    graphs = [_random_graph(rng, n, deg_max) for _ in range(num_graphs)]
    bucket = Bucket(
        num_nodes=n * num_graphs + 4,
        num_edges=sum(g.num_edges for g in graphs) + 11,
        num_graphs=num_graphs,
    )
    plain = collate_shards([graphs], bucket, extra_graph_keys=("label",))
    dense = densify_edges_by_receiver(plain, deg_max + 2, out_degree=4 * deg_max)
    return plain, dense


def test_densify_layout_invariants():
    rng = np.random.default_rng(0)
    plain, dense = _batches(rng)
    K = dense.edge_dense_degree
    N = dense.num_nodes
    assert dense.num_edges == N * K
    recv = np.asarray(dense.receivers)
    # slot-major: receiver of edge row k*N + n is n — real AND padding slots
    assert (recv.reshape(K, N) == np.arange(N)[None, :]).all()
    # same multiset of real edges
    m_p = np.asarray(plain.edge_pad_mask)
    m_d = np.asarray(dense.edge_pad_mask)
    assert m_d.sum() == m_p.sum()

    def key(b, m):
        s = np.asarray(b.senders)[m]
        r = np.asarray(b.receivers)[m]
        t = np.asarray(b.extras["edge_tag"])[m]
        return set(zip(s.tolist(), r.tolist(), np.round(t, 5).tolist()))

    assert key(plain, m_p) == key(dense, m_d)
    # per-edge extras rode along; per-graph extras untouched
    assert dense.extras["edge_tag"].shape[0] == N * K
    np.testing.assert_array_equal(dense.extras["label"], plain.extras["label"])


def test_densify_rejects_overfull_degree():
    rng = np.random.default_rng(1)
    plain, _ = _batches(rng, deg_max=6)
    with pytest.raises(ValueError, match="in-degree"):
        densify_edges_by_receiver(plain, 3)


@pytest.mark.parametrize("model_kind", ["lba", "nms"])
def test_dense_layout_matches_plain_forward_and_grads(model_kind):
    rng = np.random.default_rng(2)
    plain, dense = _batches(rng)

    model_cfg = ModelCfg(
        chi_input_dim=2, e_input_dim=16, xi_input_dim=1,
        h_hidden_dim=32, chi_hidden_dim=16, e_hidden_dim=16, xi_hidden_dim=4,
        num_encoder_layers=2, dropout=0.0,
    )
    common = dict(
        module_cfg=ModuleCfg(),
        layer_cfg=LayerCfg(mp_cfg=MPCfg(num_message_layers=3)),
    )
    if model_kind == "lba":
        model = GCPNetLBA(model_cfg=model_cfg, num_atom_types=9, **common)
    else:
        # NMS takes float node scalars (|v|), not embedded atom types
        import dataclasses

        model = GCPNetNMS(
            model_cfg=dataclasses.replace(model_cfg, h_input_dim=1),
            **common,
        )
        h_f = np.abs(
            np.asarray(plain.h, np.float32)[:, None] * 0.1
        ) + 0.5
        plain = plain.replace(h=h_f)
        dense = dense.replace(h=h_f)

    params = model.init(jax.random.key(0), plain, deterministic=True)
    y_plain = model.apply(params, plain, deterministic=True)
    y_dense = model.apply(params, dense, deterministic=True)

    def flt(y):
        return np.concatenate(
            [np.asarray(v).ravel() for v in jax.tree.leaves(y)]
        )

    if model_kind == "nms":
        # compare positions only on real nodes (padding rows differ by layout)
        mask = np.asarray(plain.valid_node_mask())
        a = np.asarray(y_plain)[mask]
        b = np.asarray(y_dense)[mask]
    else:
        a, b = flt(y_plain), flt(y_dense)
    np.testing.assert_allclose(a, b, atol=2e-5, rtol=2e-4)

    # gradients agree too (the broadcast/axis-sum backward replaces scatters)
    if model_kind == "lba":
        def loss(p, b):
            return graph_regression_loss(
                model.apply(p, b, deterministic=True), b
            )[0]

        g_plain = jax.grad(loss)(params, plain)
        g_dense = jax.grad(loss)(params, dense)
        for gp, gd in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_dense)):
            np.testing.assert_allclose(
                np.asarray(gp), np.asarray(gd), atol=5e-5, rtol=5e-4
            )


def test_dense_segment_ops_match_scatter():
    from gcpnet_tpu.ops.segment import segment_mean, segment_sum

    rng = np.random.default_rng(3)
    N, K, C = 10, 4, 7
    data = jnp.asarray(rng.normal(size=(N * K, C)).astype(np.float32))
    # slot-major: row k*N + n belongs to segment n
    ids = jnp.tile(jnp.arange(N, dtype=jnp.int32), K)
    mask = jnp.asarray(rng.random(N * K) < 0.7)

    s_scatter = segment_sum(data, ids, N, mask=mask)
    s_dense = segment_sum(data, ids, N, mask=mask, dense_degree=K)
    np.testing.assert_allclose(s_scatter, s_dense, atol=1e-6)

    m_scatter = segment_mean(data, ids, N, mask=mask)
    m_dense = segment_mean(data, ids, N, mask=mask, dense_degree=K)
    np.testing.assert_allclose(m_scatter, m_dense, atol=1e-6)

    with pytest.raises(ValueError, match="mask"):
        segment_sum(data, ids, N, dense_degree=K)
    with pytest.raises(ValueError, match="rows"):
        segment_sum(data[:-1], ids[:-1], N, mask=mask[:-1], dense_degree=K)


@pytest.mark.parametrize("mode", ["reshape", "matmul", "slices"])
def test_dense_reduce_modes_agree(mode, monkeypatch):
    """All GCPNET_DENSE_REDUCE emission strategies compute the same sum."""
    import gcpnet_tpu.ops.segment as seg

    monkeypatch.setattr(seg, "DENSE_REDUCE_MODE", mode)
    rng = np.random.default_rng(4)
    N, K, C = 9, 5, 6
    data = jnp.asarray(rng.normal(size=(N * K, C)).astype(np.float32))
    ids = jnp.tile(jnp.arange(N, dtype=jnp.int32), K)
    mask = jnp.asarray(rng.random(N * K) < 0.7)
    out = seg.segment_sum(data, ids, N, mask=mask, dense_degree=K)
    ref = seg.segment_sum(data, ids, N, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_sender_perm_invariants_and_grad_parity():
    """build_sender_perm covers every real edge exactly once with the right
    sender per slot; gather_by_senders' perm backward matches the plain
    gather's scatter backward bitwise (for pad-masked cotangents, which is
    what the model produces — see the CONTRACT in ops/segment.py)."""
    from gcpnet_tpu.ops.segment import gather_by_senders

    rng = np.random.default_rng(7)
    plain, dense = _batches(rng)
    perm = np.asarray(dense.sender_perm)
    K_out = dense.sender_out_degree
    N = dense.num_nodes
    assert perm.shape == (K_out * N,)
    snd = np.asarray(dense.senders)
    real = np.flatnonzero(np.asarray(dense.edge_pad_mask))
    assert sorted(perm[perm >= 0].tolist()) == sorted(real.tolist())
    slots = np.flatnonzero(perm >= 0)
    assert (snd[perm[slots]] == slots % N).all()

    C = 5
    nodes = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))
    w = jnp.asarray(
        rng.normal(size=(dense.num_edges, C)).astype(np.float32)
    ) * jnp.asarray(np.asarray(dense.edge_pad_mask))[:, None]
    sndj = jnp.asarray(snd)
    permj = jnp.asarray(perm)

    g_perm = jax.grad(
        lambda nd: (gather_by_senders(nd, sndj, permj, K_out) * w).sum()
    )(nodes)
    g_plain = jax.grad(lambda nd: (nd[sndj] * w).sum())(nodes)
    np.testing.assert_array_equal(np.asarray(g_perm), np.asarray(g_plain))

    # overflow guard: a budget below the max out-degree raises
    from gcpnet_tpu.data.batching import build_sender_perm

    counts = np.bincount(snd[real], minlength=N)
    with pytest.raises(ValueError, match="out-degree"):
        build_sender_perm(
            snd, np.asarray(dense.edge_pad_mask), N, int(counts.max()) - 1
        )


def test_sender_mean_matches_segment_mean():
    from gcpnet_tpu.ops.segment import segment_mean, sender_mean

    rng = np.random.default_rng(8)
    plain, dense = _batches(rng)
    N, E = dense.num_nodes, dense.num_edges
    data = jnp.asarray(rng.normal(size=(E, 9)).astype(np.float32))
    pad = jnp.asarray(np.asarray(dense.edge_pad_mask))
    em = pad & jnp.asarray(rng.random(E) < 0.8)
    sndj = jnp.asarray(np.asarray(dense.senders))
    m_perm = sender_mean(
        data, sndj, N, mask=em, count_mask=pad,
        sender_perm=jnp.asarray(np.asarray(dense.sender_perm)),
        out_degree=dense.sender_out_degree,
    )
    m_scatter = segment_mean(data, sndj, N, mask=em, count_mask=pad)
    np.testing.assert_allclose(
        np.asarray(m_perm), np.asarray(m_scatter), atol=1e-5
    )
