"""Equivalence of the fused low-pass-count GCP2 edge path (the production
default, nn/gcp.py GCP2._fused_edge_call) vs the canonical module-by-module
forward: identical parameter trees, matching outputs and gradients.

The fused path re-associates the edge-mode GCP2 into ~4 wide matmuls
(block-diagonal vector kernels, the scalarize product grid as one matmul,
the vector gate folded into scalar_out) — same math, same params; only
float rounding may differ (re-association).  Reference hot loop:
/root/reference/src/models/components/gcpnet.py:252-468.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gcpnet_tpu.nn.gcp as gcp_mod
from gcpnet_tpu.config.schema import LayerCfg, ModelCfg, ModuleCfg, MPCfg
from gcpnet_tpu.data.batching import Bucket, batches_from_dataset
from gcpnet_tpu.graph import GraphData
from gcpnet_tpu.models import GCPNetLBA, graph_regression_loss
from gcpnet_tpu.nn.frames import localize
from gcpnet_tpu.nn.gcp import GCP2, GCPSettings
from gcpnet_tpu.nn.primitives import ScalarVector

RNG = np.random.default_rng(11)


def _edge_inputs(e=96, s_in=12, v_in=8):
    rep = ScalarVector(
        jnp.asarray(RNG.normal(size=(e, s_in)).astype(np.float32)),
        jnp.asarray(RNG.normal(size=(e, 3 * v_in)).astype(np.float32)),
    )
    n = 24
    x = jnp.asarray((RNG.normal(size=(n, 3)) * 4).astype(np.float32))
    senders = jnp.asarray(RNG.integers(0, n, size=e).astype(np.int32))
    receivers = jnp.asarray(RNG.integers(0, n, size=e).astype(np.int32))
    frames = localize(x, senders, receivers)
    edge_mask = jnp.asarray(np.arange(e) < e - 7)
    return rep, senders, receivers, frames, edge_mask


@pytest.mark.parametrize(
    "overrides",
    [
        {},  # production LBA/PSR/CPD config: vector_gate, identity vec act
        {"vector_gate": False},
        {"vector_nonlinearity": "sigmoid"},
        {"bottleneck": 1},
    ],
    ids=["default", "no_gate", "vec_act", "no_bottleneck"],
)
def test_fused_gcp2_edge_matches_module_path(monkeypatch, overrides):
    rep, senders, receivers, frames, edge_mask = _edge_inputs()
    cfg = ModuleCfg(selected_gcp="GCP2", **overrides)
    settings = GCPSettings.from_cfg(cfg)
    module = GCP2(
        input_dims=(12, 8), output_dims=(10, 4), settings=settings
    )

    def run(fused):
        monkeypatch.setattr(gcp_mod, "USE_FUSED_GCP", fused)
        params = module.init(
            jax.random.key(3), rep, senders, receivers, frames,
            node_inputs=False, edge_mask=edge_mask,
        )

        def f(p, r):
            out = module.apply(
                p, r, senders, receivers, frames,
                node_inputs=False, edge_mask=edge_mask,
            )
            return jnp.sum(out.scalar ** 2) + jnp.sum(out.vector ** 2)

        val, grads = jax.value_and_grad(f, argnums=(0, 1))(params, rep)
        return params, float(val), grads

    p_plain, v_plain, g_plain = run(False)
    p_fused, v_fused, g_fused = run(True)

    # identical parameter trees (same names, shapes, and init values)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        p_plain,
        p_fused,
    )
    assert v_fused == pytest.approx(v_plain, rel=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
        ),
        g_plain,
        g_fused,
    )


@pytest.mark.parametrize(
    "overrides",
    [
        {},
        {"vector_gate": False},
        {"vector_residual": True},
        {"bottleneck": 2},
    ],
    ids=["default", "no_gate", "vec_residual", "bottleneck2"],
)
def test_fused_gcp2_node_matches_module_path(monkeypatch, overrides):
    """Node-mode (node_inputs=True + node_frames) fused path parity —
    covers the interactions feedforward / position-update GCPs."""
    from gcpnet_tpu.nn.frames import node_mean_frames

    n, e, s_in, v_in = 24, 96, 12, 8
    rep = ScalarVector(
        jnp.asarray(RNG.normal(size=(n, s_in)).astype(np.float32)),
        jnp.asarray(RNG.normal(size=(n, 3 * v_in)).astype(np.float32)),
    )
    x = jnp.asarray((RNG.normal(size=(n, 3)) * 4).astype(np.float32))
    senders = jnp.asarray(RNG.integers(0, n, size=e).astype(np.int32))
    receivers = jnp.asarray(RNG.integers(0, n, size=e).astype(np.int32))
    frames = localize(x, senders, receivers)
    edge_mask = jnp.asarray(np.arange(e) < e - 7)
    nf = node_mean_frames(frames, senders, n, edge_mask, edge_mask)

    cfg = ModuleCfg(selected_gcp="GCP2", **overrides)
    settings = GCPSettings.from_cfg(cfg)
    # vector_residual adds the raw input vectors, so v_out must equal v_in
    v_out = v_in if overrides.get("vector_residual") else 4
    module = GCP2(
        input_dims=(s_in, v_in), output_dims=(10, v_out), settings=settings
    )

    def run(fused):
        monkeypatch.setattr(gcp_mod, "USE_FUSED_GCP", fused)
        params = module.init(
            jax.random.key(3), rep, senders, receivers, frames,
            node_inputs=True, edge_mask=edge_mask, count_mask=edge_mask,
            node_frames=nf,
        )

        def f(p, r):
            out = module.apply(
                p, r, senders, receivers, frames,
                node_inputs=True, edge_mask=edge_mask,
                count_mask=edge_mask, node_frames=nf,
            )
            return jnp.sum(out.scalar ** 2) + jnp.sum(out.vector ** 2)

        val, grads = jax.value_and_grad(f, argnums=(0, 1))(params, rep)
        return params, float(val), grads

    p_plain, v_plain, g_plain = run(False)
    p_fused, v_fused, g_fused = run(True)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        p_plain,
        p_fused,
    )
    assert v_fused == pytest.approx(v_plain, rel=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
        ),
        g_plain,
        g_fused,
    )


@pytest.mark.heavy
def test_fused_gcp_whole_model_parity(monkeypatch):
    """Full LBA model: default (fused) vs forced-off — loss and grads."""
    graphs = []
    for _ in range(2):
        n, e = 20, 70
        graphs.append(
            GraphData(
                h=RNG.integers(0, 9, size=n).astype(np.int32),
                chi=RNG.normal(size=(n, 2, 3)).astype(np.float32),
                e=RNG.normal(size=(e, 16)).astype(np.float32),
                xi=RNG.normal(size=(e, 1, 3)).astype(np.float32),
                x=(RNG.normal(size=(n, 3)) * 4).astype(np.float32),
                senders=RNG.integers(0, n, size=e).astype(np.int32),
                receivers=RNG.integers(0, n, size=e).astype(np.int32),
                extras={"label": np.float32(RNG.normal())},
            )
        )
    bucket = Bucket(num_nodes=48, num_edges=256, num_graphs=3)
    batch = next(
        batches_from_dataset(
            graphs, bucket, drop_last=False, extra_graph_keys=("label",)
        )
    )
    model = GCPNetLBA(
        model_cfg=ModelCfg(
            chi_input_dim=2, e_input_dim=16, xi_input_dim=1,
            h_hidden_dim=16, chi_hidden_dim=4, e_hidden_dim=8,
            xi_hidden_dim=4, num_encoder_layers=2,
        ),
        module_cfg=ModuleCfg(),
        layer_cfg=LayerCfg(mp_cfg=MPCfg(num_message_layers=2)),
        num_atom_types=9,
    )

    def run(fused):
        monkeypatch.setattr(gcp_mod, "USE_FUSED_GCP", fused)
        dev = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a) if a is not None else None, batch
        )
        params = model.init(jax.random.key(0), dev, True)

        def loss_of(p):
            out = model.apply(p, dev, True)
            loss, _ = graph_regression_loss(out, dev)
            return loss

        loss, grads = jax.value_and_grad(loss_of)(params)
        return float(loss), grads

    loss_plain, g_plain = run(False)
    loss_fused, g_fused = run(True)
    assert loss_fused == pytest.approx(loss_plain, abs=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4
        ),
        g_plain,
        g_fused,
    )
