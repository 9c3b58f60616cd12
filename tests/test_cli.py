"""CLI integration tests — the analog of the reference's
tests/test_train.py / test_sweeps.py (fast_dev_run, multirun) driven
through train.main() in-process on a tiny NMS setup."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import train as train_cli  # noqa: E402

pytestmark = pytest.mark.heavy  # compile-heavy integration tier


TINY = [
    "experiment=gcpnet_nms_small",
    "trainer.accelerator=cpu",
    "datamodule.num_train=32",
    "datamodule.num_valid=16",
    "datamodule.num_test=16",
    "datamodule.batch_size=16",
    "datamodule.data_dir=/tmp/nms_test_data",
    "model.model_cfg.h_hidden_dim=16",
    "model.model_cfg.chi_hidden_dim=4",
    "model.model_cfg.e_hidden_dim=8",
    "model.model_cfg.num_encoder_layers=1",
    "model.layer_cfg.mp_cfg.num_message_layers=2",
]


@pytest.fixture(autouse=True)
def _project_root(tmp_path, monkeypatch):
    monkeypatch.setenv("PROJECT_ROOT", str(tmp_path))


def test_fast_dev_run():
    metrics = train_cli.main(TINY + ["debug=fdr"])
    assert "test/loss" in metrics
    assert metrics["test/loss"] == metrics["test/loss"]  # not NaN


def test_train_flag_false_skips_training():
    metrics = train_cli.main(TINY + ["debug=fdr", "train=false"])
    assert "train/loss" not in metrics
    assert "test/loss" in metrics


def test_multirun_sweep():
    results = train_cli.main(
        ["-m"] + TINY + ["debug=fdr", "seed=7,8"]
    )
    assert len(results) == 2
    assert all("test/loss" in r for r in results)
