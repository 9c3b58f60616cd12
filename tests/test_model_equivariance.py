"""Full task-model equivariance: NMS position predictions must be
SE(3)-equivariant end-to-end (rotate+translate inputs => predictions
rotate+translate), and LBA graph outputs invariant."""

import jax
import jax.numpy as jnp
import numpy as np

from conftest import random_rotation
from gcpnet_tpu.config.schema import LayerCfg, ModelCfg, ModuleCfg, MPCfg
from gcpnet_tpu.data.batching import Bucket, batches_from_dataset
from gcpnet_tpu.graph import GraphData
from gcpnet_tpu.models import GCPNetLBA, GCPNetNMS

RNG = np.random.default_rng(5)


def _transform(batch, Q, t):
    R = np.asarray(Q, dtype=np.float32)
    x = np.asarray(batch.x) @ R.T + np.asarray(t, np.float32)[None, :]
    x = x * np.asarray(batch.node_pad_mask)[:, None]
    return batch.replace(
        x=jnp.asarray(x),
        chi=jnp.asarray(np.asarray(batch.chi) @ R.T),
        xi=jnp.asarray(np.asarray(batch.xi) @ R.T),
    )


def test_nms_model_position_equivariance(rng):
    n = 5
    graphs = []
    for _ in range(2):
        s, r = np.nonzero(~np.eye(n, dtype=bool))
        graphs.append(
            GraphData(
                h=RNG.normal(size=(n, 1)).astype(np.float32),
                chi=RNG.normal(size=(n, 3, 3)).astype(np.float32),
                e=RNG.normal(size=(n * (n - 1), 17)).astype(np.float32),
                xi=RNG.normal(size=(n * (n - 1), 1, 3)).astype(np.float32),
                x=RNG.normal(size=(n, 3)).astype(np.float32),
                senders=s.astype(np.int32),
                receivers=r.astype(np.int32),
                extras={"label": RNG.normal(size=(n, 3)).astype(np.float32)},
            )
        )
    batch = next(
        batches_from_dataset(graphs, Bucket(n * 2, n * (n - 1) * 2, 2))
    )
    batch = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a) if a is not None else None, batch
    )
    model = GCPNetNMS(
        model_cfg=ModelCfg(
            h_input_dim=1, chi_input_dim=3, e_input_dim=17, xi_input_dim=1,
            h_hidden_dim=16, chi_hidden_dim=4, e_hidden_dim=8,
            xi_hidden_dim=4, num_encoder_layers=2, dropout=0.0,
        ),
        module_cfg=ModuleCfg(),
        layer_cfg=LayerCfg(mp_cfg=MPCfg(num_message_layers=2)),
    )
    params = model.init(jax.random.key(0), batch, True)
    Q = random_rotation(rng)
    t = rng.normal(size=3) * 10

    out0 = np.asarray(model.apply(params, batch, True))
    out1 = np.asarray(model.apply(params, _transform(batch, Q, t), True))
    expected = (
        out0 @ np.asarray(Q, np.float32).T + np.asarray(t, np.float32)
    ) * np.asarray(batch.node_pad_mask)[:, None]
    np.testing.assert_allclose(out1, expected, atol=2e-4)


def test_lba_model_output_invariance(rng):
    n, e = 20, 60
    graphs = [
        GraphData(
            h=RNG.integers(0, 9, size=n).astype(np.int32),
            chi=RNG.normal(size=(n, 2, 3)).astype(np.float32),
            e=RNG.normal(size=(e, 16)).astype(np.float32),
            xi=RNG.normal(size=(e, 1, 3)).astype(np.float32),
            x=(RNG.normal(size=(n, 3)) * 4).astype(np.float32),
            senders=RNG.integers(0, n, size=e).astype(np.int32),
            receivers=RNG.integers(0, n, size=e).astype(np.int32),
            extras={"label": np.float32(1.0)},
        )
        for _ in range(2)
    ]
    batch = next(
        batches_from_dataset(
            graphs, Bucket(48, 160, 3), drop_last=False,
            extra_graph_keys=("label",),
        )
    )
    batch = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a) if a is not None else None, batch
    )
    model = GCPNetLBA(
        model_cfg=ModelCfg(
            chi_input_dim=2, e_input_dim=16, xi_input_dim=1,
            h_hidden_dim=16, chi_hidden_dim=4, e_hidden_dim=8,
            xi_hidden_dim=4, num_encoder_layers=1, dropout=0.0,
            dense_dropout=0.0,
        ),
        module_cfg=ModuleCfg(),
        layer_cfg=LayerCfg(mp_cfg=MPCfg(num_message_layers=2)),
        num_atom_types=9,
    )
    params = model.init(jax.random.key(0), batch, True)
    Q = random_rotation(rng)
    t = rng.normal(size=3) * 10
    out0 = np.asarray(model.apply(params, batch, True))
    out1 = np.asarray(model.apply(params, _transform(batch, Q, t), True))
    np.testing.assert_allclose(out1, out0, atol=1e-4)
