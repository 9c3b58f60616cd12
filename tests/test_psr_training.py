"""PSR end-to-end CLI training on synthetic npz records, including the
per-target local/global correlation metrics."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_psr_cli_training(tmp_path, monkeypatch):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import train as train_cli
    from test_atom3d_datamodule import _write_records

    monkeypatch.setenv("PROJECT_ROOT", str(tmp_path))
    _write_records(str(tmp_path / "ATOM3D"), "PSR", n_records=8)

    metrics = train_cli.main(
        [
            "experiment=gcpnet_psr",
            "trainer.accelerator=cpu",
            "trainer.max_epochs=2",
            "trainer.min_epochs=0",
            f"datamodule.data_dir={tmp_path / 'ATOM3D'}",
            "datamodule.batch_size=4",
            "model.model_cfg.h_hidden_dim=16",
            "model.model_cfg.chi_hidden_dim=4",
            "model.model_cfg.e_hidden_dim=8",
            "model.model_cfg.num_encoder_layers=1",
            "model.layer_cfg.mp_cfg.num_message_layers=2",
            "callbacks.early_stopping.patience=100",
        ]
    )
    assert np.isfinite(metrics["test/loss"])
    # PSR-specific per-target + global correlations (SURVEY.md §2.3)
    assert "test/global_pearson" in metrics
    assert "test/local_spearman" in metrics