"""End-to-end equivalence of the FUSED Pallas message-stack kernel
(gather -> GCP stack -> segment reduce in VMEM) vs the plain path:
same params, same outputs, same gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gcpnet_tpu.ops.pallas_fused as pf
from gcpnet_tpu.config.schema import LayerCfg, ModelCfg, ModuleCfg, MPCfg
from gcpnet_tpu.data.batching import (
    Bucket,
    batches_from_dataset,
    sort_edges_by_receiver,
)
from gcpnet_tpu.graph import GraphData
from gcpnet_tpu.models import GCPNetLBA, graph_regression_loss
from gcpnet_tpu.nn.message_passing import GCPMessagePassing
from gcpnet_tpu.nn.primitives import ScalarVector
from gcpnet_tpu.ops.pallas_segment import row_splits_from_sorted_ids

pytestmark = pytest.mark.heavy  # compile-heavy integration tier

RNG = np.random.default_rng(7)


@pytest.fixture(autouse=True)
def _interpret_on_cpu():
    if jax.default_backend() != "tpu":
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            yield
    else:
        yield


def _graphs():
    out = []
    for _ in range(2):
        n, e = 20, 70
        out.append(
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
    return out


def test_fused_model_matches_plain_forward_and_grads(monkeypatch):
    graphs = _graphs()
    bucket = Bucket(num_nodes=48, num_edges=256, num_graphs=3)
    plain = next(
        batches_from_dataset(
            graphs, bucket, drop_last=False, extra_graph_keys=("label",)
        )
    )
    sorted_batch = sort_edges_by_receiver(plain)
    assert sorted_batch.edge_row_splits is not None

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

    def run(batch, use_fused):
        monkeypatch.setattr(pf, "USE_FUSED_MESSAGE", use_fused)
        dev = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a) if a is not None else None, batch
        )
        params = model.init(jax.random.key(0), dev, True)

        def loss_of(p):
            out = model.apply(p, dev, True)
            loss, _ = graph_regression_loss(out, dev)
            return loss, out

        (loss, out), grads = jax.value_and_grad(loss_of, has_aux=True)(params)
        return np.asarray(out), float(loss), grads

    out_plain, loss_plain, g_plain = run(sorted_batch, False)
    out_fused, loss_fused, g_fused = run(sorted_batch, True)
    np.testing.assert_allclose(out_fused, out_plain, atol=1e-4)
    assert loss_fused == pytest.approx(loss_plain, abs=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4
        ),
        g_fused,
        g_plain,
    )


@pytest.mark.parametrize("reduce_function", ["sum", "mean"])
def test_fused_mp_module_with_attention(monkeypatch, reduce_function):
    """Raw GCPMessagePassing with scalar message attention + ResGCP stack:
    fused vs plain on a hand-built tile-aligned layout."""
    n, e_real, e_total = 24, 100, 256
    s_dim, v_dim, es, ev = 12, 4, 8, 4  # v dims divisible by bottleneck 4
    ids = np.sort(RNG.integers(0, n, size=e_real)).astype(np.int32)
    splits = row_splits_from_sorted_ids(ids, n)  # single tile: aligned

    node = ScalarVector(
        jnp.asarray(RNG.normal(size=(n, s_dim)).astype(np.float32)),
        jnp.asarray(RNG.normal(size=(n, 3 * v_dim)).astype(np.float32)),
    )
    edge = ScalarVector(
        jnp.asarray(RNG.normal(size=(e_total, es)).astype(np.float32)),
        jnp.asarray(RNG.normal(size=(e_total, 3 * ev)).astype(np.float32)),
    )
    senders = jnp.asarray(
        np.concatenate(
            [RNG.integers(0, n, size=e_real), np.zeros(e_total - e_real)]
        ).astype(np.int32)
    )
    receivers = jnp.asarray(
        np.concatenate([ids, np.zeros(e_total - e_real)]).astype(np.int32)
    )
    frames = jnp.asarray(RNG.normal(size=(e_total, 9)).astype(np.float32))
    edge_mask = jnp.asarray(
        np.arange(e_total) < e_real
    )

    module = GCPMessagePassing(
        input_dims=(s_dim, v_dim),
        output_dims=(s_dim, v_dim),
        edge_dims=(es, ev),
        cfg=ModuleCfg(),
        layer_cfg=LayerCfg(mp_cfg=MPCfg(num_message_layers=3)),
        reduce_function=reduce_function,
        use_scalar_message_attention=True,
    )

    def run(use_fused, row_splits):
        monkeypatch.setattr(pf, "USE_FUSED_MESSAGE", use_fused)
        params = module.init(
            jax.random.key(1), node, edge, senders, receivers, frames,
            edge_mask=edge_mask, row_splits=row_splits,
        )

        def loss_of(p):
            out = module.apply(
                p, node, edge, senders, receivers, frames,
                edge_mask=edge_mask, row_splits=row_splits,
            )
            return jnp.sum(out.scalar**2) + jnp.sum(out.vector**2)

        loss, grads = jax.value_and_grad(loss_of)(params)
        return float(loss), grads

    loss_plain, g_plain = run(False, None)
    loss_fused, g_fused = run(True, jnp.asarray(splits))
    assert loss_fused == pytest.approx(loss_plain, rel=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4
        ),
        g_fused,
        g_plain,
    )
