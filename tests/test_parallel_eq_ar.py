"""Multi-device data parallelism over the EQ/AR trunk (GCPInteractions2,
``aggregate_with_row``, residue pooling, position updates) on the virtual
8-device CPU mesh.

The receiver-keyed GCPInteractions trunk already has 1-dev ≡ 8-dev loss
coverage (tests/test_parallel.py); the EQ/AR trunk aggregates by SENDER and
pools atoms onto residues through shard-local residue tables
(data/eq.py:_globalize_residues, data/ar.py:_globalize_ar_residues), which
is exactly the machinery a wrong P('dp') split would corrupt.  Reference
analog: gcp_interaction_layer_eq.yaml:5-6 + the ddp_sim CPU simulation
(tests/test_sweeps.py:42-58).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcpnet_tpu.config.schema import LayerCfg, ModelCfg, ModuleCfg, MPCfg
from gcpnet_tpu.data.batching import Bucket, batches_from_dataset
from gcpnet_tpu.data.eq import _globalize_residues
from gcpnet_tpu.data.ar import _globalize_ar_residues
from gcpnet_tpu.graph import GraphData
from gcpnet_tpu.models import GCPNetAR, GCPNetEQ, ar_loss, eq_loss
from gcpnet_tpu.parallel import make_mesh
from gcpnet_tpu.train import Trainer

pytestmark = pytest.mark.heavy  # compile-heavy integration tier

N_ATOMS = 24
N_RES = 6  # 4 atoms per residue
N_EDGES = 96
H_DIM = 8
E_DIM = 18

EQ_TRUNK_CFG = dict(
    module_cfg=ModuleCfg(selected_gcp="GCP3"),
    layer_cfg=LayerCfg(
        mp_cfg=MPCfg(num_message_layers=2),
        pre_norm=True,
        use_scalar_message_attention=True,
        aggregate_with_row=True,
    ),
)


def _synthetic_graph(rng: np.random.Generator, task: str) -> GraphData:
    """Equal-size protein-like graph: equal residue counts per shard make
    the pmean of per-shard masked means exactly the global mean."""
    n, e, r = N_ATOMS, N_EDGES, N_RES
    res_idx = np.repeat(np.arange(r, dtype=np.int32), n // r)
    coords = rng.normal(size=(n, 3)).astype(np.float32) * 4
    extras = {"atom_residue_idx": res_idx}
    if task == "eq":
        extras["atom_types"] = rng.integers(0, 38, size=n).astype(np.int32)
        extras["label"] = rng.uniform(size=r).astype(np.float32)
        extras["res_mask"] = np.ones(r, dtype=np.float32)
    else:  # ar
        extras["label"] = (coords + rng.normal(size=(n, 3)) * 0.1).astype(
            np.float32
        )
        extras["ca_x_local"] = coords[:: n // r].astype(np.float32)
        extras["num_atoms_per_residue"] = np.full(r, n // r, dtype=np.int32)
    return GraphData(
        h=rng.normal(size=(n, H_DIM)).astype(np.float32),
        chi=rng.normal(size=(n, 2, 3)).astype(np.float32),
        e=rng.normal(size=(e, E_DIM)).astype(np.float32),
        xi=rng.normal(size=(e, 1, 3)).astype(np.float32),
        x=coords,
        senders=rng.integers(0, n, size=e).astype(np.int32),
        receivers=np.repeat(np.arange(n, dtype=np.int32), e // n),
        extras=extras,
    )


def _collate(graphs, num_shards, task):
    per_shard = len(graphs) // num_shards
    bucket = Bucket(
        num_nodes=N_ATOMS * per_shard + 8,
        num_edges=N_EDGES * per_shard + 8,
        num_graphs=per_shard + 1,
    )
    batch = next(
        batches_from_dataset(
            graphs, bucket, num_shards=num_shards, drop_last=False
        )
    )
    max_res = N_RES * per_shard + 2
    if task == "eq":
        return _globalize_residues(batch, max_res, num_shards)
    return _globalize_ar_residues(batch, max_res, num_shards)


def _model(task):
    mc = ModelCfg(
        h_input_dim=H_DIM, chi_input_dim=2, e_input_dim=E_DIM,
        xi_input_dim=1, h_hidden_dim=16, chi_hidden_dim=4, e_hidden_dim=8,
        xi_hidden_dim=4, num_encoder_layers=1, dropout=0.0,
        dense_dropout=0.0,  # rng pattern differs per layout; must be off
    )
    if task == "eq":
        return GCPNetEQ(model_cfg=mc, **EQ_TRUNK_CFG)
    return GCPNetAR(model_cfg=mc, **EQ_TRUNK_CFG)


def _two_step_losses(task, loss_fn, num_shards):
    rng = np.random.default_rng(3)
    graphs = [_synthetic_graph(rng, task) for _ in range(8)]
    batch = _collate(graphs, num_shards, task)
    tr = Trainer(
        _model(task), loss_fn,
        optimizer_cfg={"_target_": "Adam", "lr": 1e-3},
        mesh=make_mesh(jax.devices()[:num_shards]),
        early_stopping_patience=None, seed=11,
    )
    dev_batch = tr._put(batch)
    tr.init_state(dev_batch)
    params = jax.device_get(tr.state.params)
    step = tr._build_train_step()
    state, key, one = tr.state, jax.random.key(0), jnp.float32(1.0)
    losses = []
    for i in range(2):
        state, loss, _ = step(state, dev_batch, jax.random.fold_in(key, i), one)
        losses.append(float(loss))
    return losses, params, batch


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_eq_trunk_dp_matches_single_device():
    """GCPInteractions2 + aggregate_with_row + residue pooling: the same
    8 graphs trained on a 1-device vs 8-device mesh give identical losses
    at step 1 (same forward) AND step 2 (same pmean'd gradient update)."""
    l1, _, _ = _two_step_losses("eq", eq_loss, 1)
    l8, _, _ = _two_step_losses("eq", eq_loss, 8)
    np.testing.assert_allclose(l1, l8, rtol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_ar_trunk_dp_loss_matches_per_shard_mean():
    """Position-updating GCPInteractions2 (AR trunk): the sharded step's
    pmean loss equals the host-computed mean of per-shard losses.  (The AR
    loss is sqrt(sum/N) per shard — not mean-decomposable across shards —
    so the 1-dev global loss is legitimately different; the shard-exact
    check is the right invariant.)"""
    losses8, params, batch = _two_step_losses("ar", ar_loss, 8)
    assert all(np.isfinite(losses8))

    model = _model("ar")

    def shard_slice(tree, s):
        def f(a):
            a = np.asarray(a)
            per = a.shape[0] // 8
            return jnp.asarray(a[s * per : (s + 1) * per])
        return jax.tree_util.tree_map(f, tree)

    per_shard = []
    for s in range(8):
        b = shard_slice(batch, s)
        preds = model.apply({"params": params}, b, True)
        loss, _ = ar_loss(preds, b)
        per_shard.append(float(loss))
    np.testing.assert_allclose(losses8[0], np.mean(per_shard), rtol=2e-5)
