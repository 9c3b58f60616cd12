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
