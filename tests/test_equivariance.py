"""Equivariance property suite.

Mirrors the reference's active property helpers
(/root/reference/tests/test_gcpnet_equivariance.py:1511-1835) but runs
automatically at every module level: under a random rotation Q, translation
g and node permutation, scalar outputs must be invariant, vector outputs
SO(3)-equivariant, features translation-invariant, positions translation-
equivariant, and nothing may go NaN.  The E(3) toggle is probed with a
reflection: with ``enable_e3_equivariance`` scalars must also be invariant
under reflection; without it they must generally not be.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import random_rotation
from gcpnet_tpu.config.schema import LayerCfg, ModuleCfg, MPCfg
from gcpnet_tpu.graph import GraphData, batch_graphs
from gcpnet_tpu.nn import (
    GCPEmbedding,
    GCPInteractions,
    GCPInteractions2,
    GCPMessagePassing,
    ScalarVector,
    pack_vector,
    unpack_vector,
    centralize,
    localize,
)
from gcpnet_tpu.nn.gcp import make_gcp

ATOL = 1e-4

NODE_DIMS = (16, 4)
EDGE_DIMS = (8, 4)  # 2*4+4 divisible by the default bottleneck (4)


def make_graph(rng, n=40, e=160, pad_n=48, pad_e=192):
    g = GraphData(
        h=rng.normal(size=(n, NODE_DIMS[0])).astype(np.float32),
        chi=rng.normal(size=(n, NODE_DIMS[1], 3)).astype(np.float32),
        e=rng.normal(size=(e, EDGE_DIMS[0])).astype(np.float32),
        xi=rng.normal(size=(e, EDGE_DIMS[1], 3)).astype(np.float32),
        x=rng.normal(size=(n, 3)).astype(np.float32),
        senders=rng.integers(0, n, size=e).astype(np.int32),
        receivers=rng.integers(0, n, size=e).astype(np.int32),
    )
    return batch_graphs([g], num_nodes=pad_n, num_edges=pad_e, num_graphs=2)


def transform_graph(batch, Q, t=None, reflect=False):
    """Rotate (and optionally translate/reflect) all geometric quantities."""
    R = np.asarray(Q, dtype=np.float32)
    if reflect:
        F = np.diag([-1.0, 1.0, 1.0]).astype(np.float32)
        R = R @ F
    x = np.asarray(batch.x) @ R.T
    if t is not None:
        x = x + np.asarray(t, dtype=np.float32)[None, :] * np.asarray(
            batch.node_pad_mask
        ).astype(np.float32)[:, None]
    return batch.replace(
        x=jnp.asarray(x),
        chi=jnp.asarray(np.asarray(batch.chi) @ R.T),
        xi=jnp.asarray(np.asarray(batch.xi) @ R.T),
    )


def frames_for(batch):
    _, centered = centralize(
        batch.x, batch.graph_id, batch.num_graphs, node_mask=batch.node_pad_mask
    )
    f = localize(
        centered, batch.senders, batch.receivers, edge_mask=batch.edge_pad_mask
    )
    return centered, f


def apply_gcp(batch, cfg, node_inputs, dims_in, dims_out, **overrides):
    _, frames = frames_for(batch)
    gcp = make_gcp(dims_in, dims_out, cfg, **overrides)
    rep = (
        ScalarVector(batch.h, pack_vector(batch.chi))
        if node_inputs
        else ScalarVector(batch.e, pack_vector(batch.xi))
    )
    params = gcp.init(
        jax.random.key(0), rep, batch.senders, batch.receivers, frames,
        node_inputs, batch.edge_pad_mask, batch.edge_pad_mask,
    )
    out = gcp.apply(
        params, rep, batch.senders, batch.receivers, frames,
        node_inputs, batch.edge_pad_mask, batch.edge_pad_mask,
    )
    return params, out


def check_so3(fn, batch, rng, atol=ATOL, translate=True):
    """fn(batch) -> (scalar, vector). Assert scalar invariance + vector
    equivariance under rotation (and translation invariance of both)."""
    Q = random_rotation(rng)
    t = rng.normal(size=3) * 10.0 if translate else None
    s0, v0 = fn(batch)
    s1, v1 = fn(transform_graph(batch, Q, t))
    assert np.isfinite(np.asarray(s0)).all() and np.isfinite(np.asarray(v0)).all()
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), atol=atol)
    np.testing.assert_allclose(
        np.asarray(v1),
        np.asarray(v0) @ np.asarray(Q, dtype=np.float32).T,
        atol=atol,
    )


@dataclasses.dataclass
class Variant:
    name: str
    cfg: ModuleCfg


VARIANTS = [
    Variant("gcp2_vector_gate", ModuleCfg(selected_gcp="GCP2", vector_gate=True)),
    Variant(
        "gcp2_frame_gate",
        ModuleCfg(selected_gcp="GCP2", vector_gate=False, frame_gate=True),
    ),
    Variant(
        "gcp2_self_gate",
        ModuleCfg(
            selected_gcp="GCP2",
            vector_gate=False,
            frame_gate=False,
            vector_nonlinearity="sigmoid",
        ),
    ),
    Variant(
        "gcp2_ablate_frames",
        ModuleCfg(selected_gcp="GCP2", ablate_frame_updates=True),
    ),
    Variant("gcp3", ModuleCfg(selected_gcp="GCP3", scalar_nonlinearity="silu")),
    Variant("gcp_v1_vector_gate", ModuleCfg(selected_gcp="GCP", vector_gate=True)),
    Variant(
        "gcp_v1_sigma_frame",
        ModuleCfg(
            selected_gcp="GCP",
            vector_gate=False,
            sigma_frame_gate=True,
            vector_nonlinearity="sigmoid",
        ),
    ),
    Variant(
        "gcp_v1_frame_gate",
        ModuleCfg(
            selected_gcp="GCP",
            vector_gate=False,
            frame_gate=True,
            vector_nonlinearity="sigmoid",
        ),
    ),
]


@pytest.mark.parametrize("variant", VARIANTS, ids=lambda v: v.name)
@pytest.mark.parametrize("node_inputs", [True, False], ids=["node", "edge"])
def test_gcp_module_equivariance(rng, variant, node_inputs):
    batch = make_graph(rng)
    dims_in = NODE_DIMS if node_inputs else EDGE_DIMS
    dims_out = (12, 4)

    def fn(b):
        _, out = apply_gcp(b, variant.cfg, node_inputs, dims_in, dims_out,
                           bottleneck=1)
        return out.scalar, unpack_vector(out.vector)

    check_so3(fn, batch, rng)


def test_gcp_scalar_only_output_invariance(rng):
    batch = make_graph(rng)
    cfg = ModuleCfg()

    def fn(b):
        _, out = apply_gcp(b, cfg, True, NODE_DIMS, (12, 0), bottleneck=1)
        return out, jnp.zeros((1, 1, 3))

    check_so3(fn, batch, rng)


def test_e3_mode_reflection_invariance(rng):
    """With enable_e3_equivariance scalar outputs are invariant under
    reflection; without it they are not (the chirality probe, reference
    components/__init__.py:304-309)."""
    batch = make_graph(rng)
    Q = random_rotation(rng)

    for e3 in (True, False):
        cfg = ModuleCfg(enable_e3_equivariance=e3)
        gcp = make_gcp(NODE_DIMS, (12, 4), cfg, bottleneck=1)
        _, frames = frames_for(batch)
        rep = ScalarVector(batch.h, pack_vector(batch.chi))
        params = gcp.init(
            jax.random.key(0), rep, batch.senders, batch.receivers, frames,
            True, batch.edge_pad_mask, batch.edge_pad_mask,
        )

        def run(b):
            _, f = frames_for(b)
            return gcp.apply(
                params, ScalarVector(b.h, pack_vector(b.chi)), b.senders, b.receivers, f,
                True, b.edge_pad_mask, b.edge_pad_mask,
            )

        out0 = run(batch)
        out1 = run(transform_graph(batch, Q, reflect=True))
        diff = np.abs(np.asarray(out1.scalar) - np.asarray(out0.scalar)).max()
        if e3:
            assert diff < ATOL, f"E(3) mode must be reflection-invariant, diff={diff}"
        else:
            assert diff > 1e-3, "SE(3) mode should be chirality-sensitive"


def _mp_fn(batch, layer_cfg, cfg):
    _, frames = frames_for(batch)
    mp = GCPMessagePassing(
        input_dims=NODE_DIMS,
        output_dims=NODE_DIMS,
        edge_dims=EDGE_DIMS,
        cfg=cfg,
        layer_cfg=layer_cfg,
    )
    node = ScalarVector(batch.h, pack_vector(batch.chi))
    edge = ScalarVector(batch.e, pack_vector(batch.xi))
    params = mp.init(
        jax.random.key(0), node, edge, batch.senders, batch.receivers, frames,
        batch.edge_pad_mask, batch.edge_pad_mask,
    )
    out = mp.apply(
        params, node, edge, batch.senders, batch.receivers, frames,
        batch.edge_pad_mask, batch.edge_pad_mask,
    )
    return out.scalar, unpack_vector(out.vector)


def test_message_passing_equivariance(rng):
    batch = make_graph(rng)
    cfg = ModuleCfg()
    layer_cfg = LayerCfg(mp_cfg=MPCfg(num_message_layers=4))
    check_so3(lambda b: _mp_fn(b, layer_cfg, cfg), batch, rng)


@pytest.mark.parametrize("layer_kind", ["v1", "v2"])
def test_interactions_equivariance(rng, layer_kind):
    batch = make_graph(rng)
    cfg = ModuleCfg(selected_gcp="GCP3" if layer_kind == "v2" else "GCP2")
    layer_cfg = LayerCfg(
        mp_cfg=MPCfg(num_message_layers=4),
        use_scalar_message_attention=layer_kind == "v2",
        aggregate_with_row=layer_kind == "v2",
    )
    cls = GCPInteractions if layer_kind == "v1" else GCPInteractions2
    layer = cls(
        node_dims=NODE_DIMS,
        edge_dims=EDGE_DIMS,
        cfg=cfg,
        layer_cfg=layer_cfg,
        dropout=0.0,
    )

    def fn(b):
        _, frames = frames_for(b)
        node = ScalarVector(b.h, pack_vector(b.chi))
        edge = ScalarVector(b.e, pack_vector(b.xi))
        kw = dict(edge_mask=b.edge_pad_mask, count_mask=b.edge_pad_mask)
        variables = layer.init(
            jax.random.key(0), node, edge, b.senders, b.receivers, frames, **kw
        )
        out = layer.apply(
            variables, node, edge, b.senders, b.receivers, frames, **kw
        )
        return out.scalar, unpack_vector(out.vector)

    check_so3(fn, batch, rng)


@pytest.mark.parametrize("layer_kind", ["v1", "v2"])
def test_position_update_equivariance(rng, layer_kind):
    """Position-updating layers: updated positions must rotate with the
    input (after centering, positions are translation-invariant here)."""
    batch = make_graph(rng)
    cfg = ModuleCfg(selected_gcp="GCP2")
    layer_cfg = LayerCfg(mp_cfg=MPCfg(num_message_layers=2))
    cls = GCPInteractions if layer_kind == "v1" else GCPInteractions2
    layer = cls(
        node_dims=NODE_DIMS,
        edge_dims=EDGE_DIMS,
        cfg=cfg,
        layer_cfg=layer_cfg,
        dropout=0.0,
        updating_node_positions=True,
    )
    Q = random_rotation(rng)

    def run(b):
        centered, frames = frames_for(b)
        node = ScalarVector(b.h, pack_vector(b.chi))
        edge = ScalarVector(b.e, pack_vector(b.xi))
        kw = dict(
            node_pos=centered, edge_mask=b.edge_pad_mask,
            count_mask=b.edge_pad_mask,
        )
        variables = layer.init(
            jax.random.key(0), node, edge, b.senders, b.receivers, frames, **kw
        )
        (_, _), pos = layer.apply(
            variables, node, edge, b.senders, b.receivers, frames, **kw
        )
        return pos

    p0 = run(batch)
    p1 = run(transform_graph(batch, Q, t=rng.normal(size=3) * 5.0))
    np.testing.assert_allclose(
        np.asarray(p1),
        np.asarray(p0) @ np.asarray(Q, dtype=np.float32).T,
        atol=ATOL,
    )


def test_embedding_equivariance(rng):
    batch = make_graph(rng)
    cfg = ModuleCfg()
    embed = GCPEmbedding(
        edge_input_dims=EDGE_DIMS,
        node_input_dims=NODE_DIMS,
        edge_hidden_dims=(12, 3),
        node_hidden_dims=(20, 5),
        cfg=cfg,
        num_atom_types=0,
    )

    def fn(b):
        _, frames = frames_for(b)
        variables = embed.init(
            jax.random.key(0), b, frames, b.edge_pad_mask, b.edge_pad_mask
        )
        node_out, edge_out = embed.apply(
            variables, b, frames, b.edge_pad_mask, b.edge_pad_mask
        )
        return node_out.scalar, unpack_vector(node_out.vector)

    check_so3(fn, batch, rng)


def test_permutation_equivariance(rng):
    """Permuting node order permutes outputs accordingly."""
    n, e = 20, 60
    g_rng = np.random.default_rng(7)
    batch = make_graph(g_rng, n=n, e=e, pad_n=n, pad_e=e)
    perm = rng.permutation(n)
    inv = np.argsort(perm)

    permuted = batch.replace(
        h=batch.h[perm],
        chi=batch.chi[perm],
        x=batch.x[perm],
        senders=jnp.asarray(inv)[batch.senders],
        receivers=jnp.asarray(inv)[batch.receivers],
        graph_id=batch.graph_id[perm],
        node_pad_mask=batch.node_pad_mask[perm],
    )

    cfg = ModuleCfg()

    def run(b):
        _, frames = frames_for(b)
        gcp = make_gcp(NODE_DIMS, (12, 4), cfg, bottleneck=1)
        rep = ScalarVector(b.h, pack_vector(b.chi))
        params = gcp.init(
            jax.random.key(0), rep, b.senders, b.receivers, frames, True,
            b.edge_pad_mask, b.edge_pad_mask,
        )
        return gcp.apply(
            params, rep, b.senders, b.receivers, frames, True,
            b.edge_pad_mask, b.edge_pad_mask,
        )

    out0 = run(batch)
    out1 = run(permuted)
    np.testing.assert_allclose(
        np.asarray(out1.scalar), np.asarray(out0.scalar)[perm], atol=ATOL
    )
    np.testing.assert_allclose(
        np.asarray(out1.vector), np.asarray(out0.vector)[perm], atol=ATOL
    )


def test_padding_independence(rng):
    """Results on real rows must not depend on the amount of padding."""
    g_rng = np.random.default_rng(3)
    small = make_graph(g_rng, n=20, e=60, pad_n=20, pad_e=60)
    g_rng = np.random.default_rng(3)
    padded = make_graph(g_rng, n=20, e=60, pad_n=64, pad_e=256)

    cfg = ModuleCfg()

    def run(b):
        _, frames = frames_for(b)
        gcp = make_gcp(NODE_DIMS, (12, 4), cfg, bottleneck=1)
        rep = ScalarVector(b.h, pack_vector(b.chi))
        params = gcp.init(
            jax.random.key(0), rep, b.senders, b.receivers, frames, True,
            b.edge_pad_mask, b.edge_pad_mask,
        )
        return gcp.apply(
            params, rep, b.senders, b.receivers, frames, True,
            b.edge_pad_mask, b.edge_pad_mask,
        )

    out_small = run(small)
    out_padded = run(padded)
    np.testing.assert_allclose(
        np.asarray(out_padded.scalar)[:20], np.asarray(out_small.scalar), atol=ATOL
    )
    np.testing.assert_allclose(
        np.asarray(out_padded.vector)[:20], np.asarray(out_small.vector), atol=ATOL
    )
