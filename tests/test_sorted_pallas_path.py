"""End-to-end equivalence of the receiver-sorted (Pallas) message
aggregation path vs the default scatter path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gcpnet_tpu.ops.segment as seg
from gcpnet_tpu.config.schema import LayerCfg, ModelCfg, ModuleCfg, MPCfg
from gcpnet_tpu.data.batching import (
    Bucket,
    batches_from_dataset,
    sort_edges_by_receiver,
)
from gcpnet_tpu.graph import GraphData
from gcpnet_tpu.models import GCPNetLBA, graph_regression_loss

pytestmark = pytest.mark.heavy  # compile-heavy integration tier


RNG = np.random.default_rng(3)


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


def _model():
    return GCPNetLBA(
        model_cfg=ModelCfg(
            chi_input_dim=2, e_input_dim=16, xi_input_dim=1,
            h_hidden_dim=16, chi_hidden_dim=4, e_hidden_dim=8,
            xi_hidden_dim=4, num_encoder_layers=1,
        ),
        module_cfg=ModuleCfg(),
        layer_cfg=LayerCfg(mp_cfg=MPCfg(num_message_layers=2)),
        num_atom_types=9,
    )


def test_sorted_path_matches_unsorted(monkeypatch):
    graphs = _graphs()
    # edge budget includes slack for the 128-edge tile alignment
    bucket = Bucket(num_nodes=48, num_edges=256, num_graphs=3)
    plain = next(
        batches_from_dataset(
            graphs, bucket, drop_last=False, extra_graph_keys=("label",)
        )
    )
    sorted_batch = sort_edges_by_receiver(plain)
    assert sorted_batch.edge_row_splits is not None
    # receivers among real edges are non-decreasing
    recv = np.asarray(sorted_batch.receivers)[
        np.asarray(sorted_batch.edge_pad_mask)
    ]
    assert np.all(np.diff(recv) >= 0)

    model = _model()

    def run(batch, use_pallas):
        monkeypatch.setattr(seg, "USE_PALLAS_SEGMENT", use_pallas)
        dev = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a) if a is not None else None, batch
        )
        params = model.init(jax.random.key(0), dev, True)
        out = model.apply(params, dev, True)
        loss, _ = graph_regression_loss(out, dev)
        return np.asarray(out), float(loss)

    out_plain, loss_plain = run(plain, False)
    # sorted batch without pallas: permutation must not change results
    out_sorted, loss_sorted = run(sorted_batch, False)
    np.testing.assert_allclose(out_sorted, out_plain, atol=1e-5)

    # sorted batch WITH the pallas kernel (interpret mode off-TPU)
    if jax.default_backend() != "tpu":
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            out_pallas, loss_pallas = run(sorted_batch, True)
    else:
        out_pallas, loss_pallas = run(sorted_batch, True)
    np.testing.assert_allclose(out_pallas, out_plain, atol=1e-4)
    assert loss_pallas == pytest.approx(loss_plain, abs=1e-4)
