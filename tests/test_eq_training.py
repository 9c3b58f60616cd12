"""EQ end-to-end training on the reference's real example decoys: full CLI
path (config compose -> datamodule -> GCPInteractions2 trunk + adaptive
grad clipping -> SmoothL1 per-residue loss -> checkpoint -> test)."""

import os

import numpy as np
import pytest

EXAMPLES = "/root/reference/data/EQ/examples"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(EXAMPLES),
        reason="reference EQ example data not present",
    ),
]


def test_eq_cli_training(tmp_path, monkeypatch):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import train as train_cli

    monkeypatch.setenv("PROJECT_ROOT", str(tmp_path))

    splits = tmp_path / "splits"
    splits.mkdir()
    for fname in ("train.lst", "valid.lst", "test.lst"):
        (splits / fname).write_text("6W6VE\n6W77K\n")

    metrics = train_cli.main(
        [
            "experiment=gcpnet_eq",
            "trainer.accelerator=cpu",
            "trainer.max_epochs=2",
            "trainer.min_epochs=0",
            f"datamodule.splits_dir={splits}",
            f"datamodule.decoy_dir={EXAMPLES}/decoy_model",
            f"datamodule.true_dir={EXAMPLES}/true_model",
            f"datamodule.model_data_cache_dir={tmp_path}/cache",
            "model.model_cfg.h_hidden_dim=16",
            "model.model_cfg.chi_hidden_dim=4",
            "model.model_cfg.e_hidden_dim=8",
            "model.model_cfg.num_encoder_layers=1",
            "model.layer_cfg.mp_cfg.num_message_layers=2",
            "callbacks.early_stopping.patience=100",
        ]
    )
    assert np.isfinite(metrics["test/loss"])
    assert metrics["test/loss"] < 1.0  # SmoothL1 on lDDT in [0,1]
    # checkpoints written
    ckpts = tmp_path / "logs" / "train" / "runs" / "checkpoints"
    assert ckpts.is_dir() and any(ckpts.iterdir())