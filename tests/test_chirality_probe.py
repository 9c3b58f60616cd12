"""The RS chirality capability probe (SURVEY.md §2.3): an SE(3) model can
learn R/S classification from geometry; with ``enable_e3_equivariance`` the
model is reflection-invariant and provably cannot separate enantiomer
pairs.  Uses the synthetic tetrahedral-center task (same schema as RS)."""

import jax
import numpy as np
import pytest

from gcpnet_tpu.config.schema import LayerCfg, ModelCfg, ModuleCfg, MPCfg
from gcpnet_tpu.data.rs import RSDataModule
from gcpnet_tpu.models import GCPNetRS, rs_loss
from gcpnet_tpu.parallel import make_mesh
from gcpnet_tpu.train import Trainer
from gcpnet_tpu.train.metrics import accuracy


def _accuracy_after_training(e3: bool, tmp_path) -> float:
    dm = RSDataModule(
        batch_size=32,
        synthetic_sizes={"train": 512, "valid": 64, "test": 128},
        seed=11,
    )
    dm.prepare_data()
    dm.setup()
    model = GCPNetRS(
        model_cfg=ModelCfg(
            h_input_dim=52, chi_input_dim=2, e_input_dim=30, xi_input_dim=1,
            h_hidden_dim=32, chi_hidden_dim=8, e_hidden_dim=16, xi_hidden_dim=4,
            num_encoder_layers=2, dropout=0.0, dense_dropout=0.0,
        ),
        module_cfg=ModuleCfg(
            scalar_nonlinearity="leakyrelu", enable_e3_equivariance=e3
        ),
        layer_cfg=LayerCfg(mp_cfg=MPCfg(num_message_layers=3)),
    )
    trainer = Trainer(
        model,
        rs_loss,
        optimizer_cfg={"_target_": "Adam", "lr": 2e-3},
        max_epochs=20,
        mesh=make_mesh(jax.devices()[:1]),
        early_stopping_patience=None,
        check_val_every_n_epoch=100,  # skip val for speed
        seed=5,
    )
    trainer.fit(dm)

    preds, labels = [], []
    for batch in dm.test_batches():
        dev = trainer._put(batch)
        out = model.apply({"params": trainer.state.params}, dev, True)
        m = np.asarray(batch.graph_pad_mask)
        preds.append(np.asarray(out)[m])
        labels.append(np.asarray(batch.extras["label"])[m])
    return accuracy(np.concatenate(preds), np.concatenate(labels))


@pytest.mark.slow
def test_se3_learns_chirality_e3_cannot(tmp_path):
    acc_se3 = _accuracy_after_training(e3=False, tmp_path=tmp_path)
    jax.clear_caches()  # avoid in-process cross-trainer interference
    acc_e3 = _accuracy_after_training(e3=True, tmp_path=tmp_path)
    # SE(3) model separates enantiomers; E(3) model is blind to them
    assert acc_se3 > 0.9, f"SE(3) model failed to learn chirality: {acc_se3}"
    assert acc_e3 < 0.65, f"E(3) model should be chirality-blind: {acc_e3}"
