"""Checkpoint/resume integration — the analog of the reference's
tests/test_train.py:69-92: train, assert checkpoints exist, resume into a
fresh trainer, continue training, loss keeps improving."""

import os

import pytest
import jax
import numpy as np

from gcpnet_tpu.config.schema import LayerCfg, ModelCfg, ModuleCfg, MPCfg
from gcpnet_tpu.data.nms import NMSDataModule
from gcpnet_tpu.models import GCPNetNMS, nms_loss
from gcpnet_tpu.parallel import make_mesh
from gcpnet_tpu.train import Trainer

pytestmark = pytest.mark.heavy  # compile-heavy integration tier



def _parts(tmp_path):
    dm = NMSDataModule(
        data_root="/tmp/nms_test_data",
        data_mode="small",
        batch_size=16,
        num_train=32,
        num_valid=16,
        num_test=16,
    )
    dm.prepare_data()
    dm.setup()
    model = GCPNetNMS(
        model_cfg=ModelCfg(
            h_input_dim=1, chi_input_dim=3, e_input_dim=17, xi_input_dim=1,
            h_hidden_dim=16, chi_hidden_dim=4, e_hidden_dim=8,
            xi_hidden_dim=4, num_encoder_layers=1,
        ),
        module_cfg=ModuleCfg(),
        layer_cfg=LayerCfg(mp_cfg=MPCfg(num_message_layers=2)),
    )

    def make_trainer(max_epochs):
        return Trainer(
            model,
            nms_loss,
            optimizer_cfg={"_target_": "Adam", "lr": 1e-3},
            max_epochs=max_epochs,
            mesh=make_mesh(jax.devices()[:1]),
            early_stopping_patience=None,
            checkpoint_dir=str(tmp_path / "ckpt"),
            seed=3,
        )

    return dm, make_trainer


def test_train_checkpoint_resume(tmp_path):
    dm, make_trainer = _parts(tmp_path)

    t1 = make_trainer(max_epochs=2)
    m1 = t1.fit(dm)
    step_after = int(t1.state.step)
    assert step_after == 4  # 2 epochs x 2 batches
    assert os.path.isdir(tmp_path / "ckpt" / "last")
    t1.ckpt.close()

    t2 = make_trainer(max_epochs=2)
    example = next(iter(dm.train_batches(seed=0)))
    t2.init_state(t2._put(example))
    restored = t2.ckpt.restore_last(t2.state)
    assert restored is not None
    t2.state = restored
    assert int(t2.state.step) == step_after
    # restored params match the trained ones exactly
    p1 = jax.tree_util.tree_leaves(t1.state.params)
    p2 = jax.tree_util.tree_leaves(t2.state.params)
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    m2 = t2.fit(dm, resume=True)
    assert int(t2.state.step) > step_after
    assert m2["val/loss"] <= m1["val/loss"] * 1.1  # keeps improving-ish
    t2.ckpt.close()