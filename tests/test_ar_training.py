"""AR end-to-end training on the reference's real example pair: CLI path
with position-updating GCPInteractions2 trunk and the RMSD-style loss."""

import os

import numpy as np
import pytest

EXAMPLES = "/root/reference/data/AR/examples"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(EXAMPLES),
        reason="reference AR example data not present",
    ),
]


def test_ar_cli_training(tmp_path, monkeypatch):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import train as train_cli

    monkeypatch.setenv("PROJECT_ROOT", str(tmp_path))

    splits = tmp_path / "splits"
    splits.mkdir()
    for fname in ("train1.lst", "valid1.lst", "test_ar.lst"):
        (splits / fname).write_text("2CZOA\n")

    metrics = train_cli.main(
        [
            "experiment=gcpnet_ar",
            "trainer.accelerator=cpu",
            "trainer.max_epochs=2",
            "trainer.min_epochs=0",
            f"datamodule.splits_dir={splits}",
            f"datamodule.af2_dir={EXAMPLES}/decoy_model",
            f"datamodule.true_dir={EXAMPLES}/true_model",
            f"datamodule.model_data_cache_dir={tmp_path}/cache",
            "datamodule.k_min=4",
            "datamodule.k_max=10",
            "model.model_cfg.h_hidden_dim=16",
            "model.model_cfg.chi_hidden_dim=8",
            "model.model_cfg.e_hidden_dim=8",
            "model.model_cfg.num_encoder_layers=1",
            "model.layer_cfg.mp_cfg.num_message_layers=2",
            "callbacks.early_stopping.patience=100",
        ]
    )
    assert np.isfinite(metrics["test/loss"])
    # RMSD-style loss on an untrained model stays modest (decoy near native)
    assert metrics["test/loss"] < 50.0