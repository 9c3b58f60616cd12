"""Data-parallel training over a virtual 8-device CPU mesh — the analog of
the reference's ddp_sim CPU test (tests/test_sweeps.py:42-58)."""

import jax
import numpy as np
import pytest

from gcpnet_tpu.config.schema import LayerCfg, ModelCfg, ModuleCfg, MPCfg
from gcpnet_tpu.data.nms import NMSDataModule
from gcpnet_tpu.models import GCPNetNMS, nms_loss
from gcpnet_tpu.parallel import make_mesh
from gcpnet_tpu.train import Trainer

pytestmark = pytest.mark.heavy  # compile-heavy integration tier



SMALL_CFG = dict(
    model_cfg=ModelCfg(
        h_input_dim=1, chi_input_dim=3, e_input_dim=17, xi_input_dim=1,
        h_hidden_dim=16, chi_hidden_dim=4, e_hidden_dim=8, xi_hidden_dim=4,
        num_encoder_layers=1, dropout=0.0,
    ),
    module_cfg=ModuleCfg(),
    layer_cfg=LayerCfg(mp_cfg=MPCfg(num_message_layers=2)),
)


def _datamodule(tmp_path, num_shards):
    dm = NMSDataModule(
        data_root=str(tmp_path),
        data_mode="small",
        batch_size=16,
        num_train=32,
        num_valid=16,
        num_test=16,
        num_shards=num_shards,
    )
    dm.prepare_data()
    dm.setup()
    return dm


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_eight_device_dp_training(tmp_path):
    mesh = make_mesh(jax.devices()[:8])
    dm = _datamodule(tmp_path, num_shards=8)
    model = GCPNetNMS(**SMALL_CFG)
    tr = Trainer(
        model,
        nms_loss,
        optimizer_cfg={"_target_": "Adam", "lr": 1e-3},
        max_epochs=1,
        mesh=mesh,
        early_stopping_patience=None,
    )
    metrics = tr.fit(dm)
    assert np.isfinite(metrics["val/loss"])


def test_dp_matches_single_device(tmp_path):
    """1-device and 8-device training must produce identical losses (the
    global batch is the same; only the sharding differs)."""
    results = {}
    for shards in (1, 8):
        dm = _datamodule(tmp_path / f"s{shards}", num_shards=shards)
        model = GCPNetNMS(**SMALL_CFG)
        tr = Trainer(
            model,
            nms_loss,
            optimizer_cfg={"_target_": "Adam", "lr": 1e-3},
            max_epochs=1,
            mesh=make_mesh(jax.devices()[:shards]),
            early_stopping_patience=None,
            seed=7,
        )
        results[shards] = tr.fit(dm)["val/loss"]
    np.testing.assert_allclose(results[1], results[8], rtol=2e-4)


EQ_EXAMPLES = "/root/reference/data/EQ/examples"


@pytest.mark.skipif(
    len(jax.devices()) < 2 or not __import__("os").path.isdir(EQ_EXAMPLES),
    reason="needs 2 virtual devices and reference EQ example data",
)
def test_two_shard_eq_training(tmp_path):
    """Multi-device EQ: shard-local residue globalization keeps per-residue
    labels aligned with their shard under shard_map's P('dp') split."""
    import os

    from gcpnet_tpu.data.eq import EQDataModule
    from gcpnet_tpu.models import GCPNetEQ, eq_loss

    splits = tmp_path / "splits"
    splits.mkdir()
    for fname in ("train.lst", "valid.lst", "test.lst"):
        (splits / fname).write_text("6W6VE\n6W77K\n")

    def make_dm(num_shards):
        return EQDataModule(
            splits_dir=str(splits),
            decoy_dir=f"{EQ_EXAMPLES}/decoy_model",
            true_dir=f"{EQ_EXAMPLES}/true_model",
            model_data_cache_dir=str(tmp_path / "cache"),
            batch_size=1,
            num_shards=num_shards,
            max_nodes_per_batch=2048,
            max_residues_per_batch=300,
        )

    from gcpnet_tpu.config.schema import LayerCfg, ModelCfg, ModuleCfg, MPCfg

    model = GCPNetEQ(
        model_cfg=ModelCfg(
            h_input_dim=1281, chi_input_dim=2, e_input_dim=18, xi_input_dim=1,
            h_hidden_dim=16, chi_hidden_dim=4, e_hidden_dim=8, xi_hidden_dim=4,
            num_encoder_layers=1, dropout=0.0,
        ),
        module_cfg=ModuleCfg(selected_gcp="GCP3"),
        layer_cfg=LayerCfg(
            mp_cfg=MPCfg(num_message_layers=2), pre_norm=True,
            use_scalar_message_attention=True, aggregate_with_row=True,
        ),
    )

    import jax.numpy as jnp

    def get_batch(num_shards, names=None):
        dm = make_dm(num_shards)
        dm.setup()
        if names is not None:
            dm.splits["train"] = names
        return next(iter(dm.batches("train", shuffle=False)))

    # 1) the full DP train step runs and yields a finite loss on 2 shards
    batch2 = get_batch(2)
    mesh = make_mesh(jax.devices()[:2])
    tr = Trainer(
        model, eq_loss, optimizer_cfg={"_target_": "Adam", "lr": 1e-3},
        mesh=mesh, early_stopping_patience=None, seed=0,
    )
    dev_batch = tr._put(batch2)
    tr.init_state(dev_batch)
    # snapshot before the step donates the state buffers
    params = jax.device_get(tr.state.params)
    step = tr._build_train_step()
    _, loss2, _ = step(tr.state, dev_batch, jax.random.key(0), jnp.float32(1.0))
    assert np.isfinite(float(loss2))

    # 2) shard-local residue globalization is exact: each shard's slice of
    # the 2-shard batch reproduces the single-graph forward loss bit-for-bit
    singles = {
        "6W6VE": get_batch(1, ["6W6VE"]),
        "6W77K": get_batch(1, ["6W77K"]),
    }

    def slice_shard(b, s):
        def f(a):
            a = np.asarray(a)
            half = a.shape[0] // 2
            return jnp.asarray(a[s * half : (s + 1) * half])
        return jax.tree_util.tree_map(f, b)

    for s, name in enumerate(singles):
        shard_batch = slice_shard(batch2, s)
        single = jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a)), singles[name]
        )
        out_shard = model.apply({"params": params}, shard_batch, True)
        out_single = model.apply({"params": params}, single, True)
        l_shard, _ = eq_loss(out_shard, shard_batch)
        l_single, _ = eq_loss(out_single, single)
        assert float(l_shard) == pytest.approx(float(l_single), rel=1e-6), name
