"""RS end-to-end CLI training on the synthetic chirality fallback."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_rs_cli_training(tmp_path, monkeypatch):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import train as train_cli

    monkeypatch.setenv("PROJECT_ROOT", str(tmp_path))

    metrics = train_cli.main(
        [
            "experiment=gcpnet_rs",
            "trainer.accelerator=cpu",
            "trainer.max_epochs=3",
            "trainer.min_epochs=0",
            "datamodule.batch_size=32",
            "datamodule.synthetic_sizes.train=128",
            "datamodule.synthetic_sizes.valid=64",
            "datamodule.synthetic_sizes.test=64",
            "model.model_cfg.h_hidden_dim=16",
            "model.model_cfg.chi_hidden_dim=4",
            "model.model_cfg.e_hidden_dim=8",
            "model.model_cfg.num_encoder_layers=1",
            "model.layer_cfg.mp_cfg.num_message_layers=2",
            "callbacks.early_stopping.patience=100",
        ]
    )
    assert np.isfinite(metrics["test/loss"])
    assert "test/Accuracy" in metrics and "test/F1" in metrics