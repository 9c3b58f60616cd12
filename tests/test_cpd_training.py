"""CPD end-to-end CLI training on a synthetic CATH-format fixture (random
backbone chains written as chain_set.jsonl + split files), exercising the
full pipeline: jsonl parsing, kNN residue featurization with masked
residues, encoder(+AR decoder) training, CE loss, checkpoints, test."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

AA = "ACDEFGHIKLMNPQRSTVWY"


def _random_chain(rng, n):
    """A protein-like backbone: a self-avoiding-ish random walk of Ca with
    N/C/O placed nearby."""
    ca = np.cumsum(rng.normal(scale=1.2, size=(n, 3)) + [3.0, 0, 0], axis=0)
    coords = np.stack(
        [
            ca + rng.normal(scale=0.4, size=(n, 3)),  # N
            ca,  # CA
            ca + rng.normal(scale=0.4, size=(n, 3)),  # C
            ca + rng.normal(scale=0.6, size=(n, 3)),  # O
        ],
        axis=1,
    ).astype(np.float32)
    seq = "".join(rng.choice(list(AA)) for _ in range(n))
    return seq, coords


def _write_fixture(data_dir, rng, n_chains=8):
    os.makedirs(data_dir, exist_ok=True)
    names = [f"chain_{i}" for i in range(n_chains)]
    with open(os.path.join(data_dir, "chain_set.jsonl"), "w") as f:
        for name in names:
            seq, coords = _random_chain(rng, int(rng.integers(12, 24)))
            record = {
                "name": name,
                "seq": seq,
                "coords": {
                    a: coords[:, i].tolist()
                    for i, a in enumerate(("N", "CA", "C", "O"))
                },
            }
            f.write(json.dumps(record) + "\n")
    splits = {
        "train": names[:4],
        "validation": names[4:6],
        "test": names[6:],
    }
    with open(os.path.join(data_dir, "chain_set_splits.json"), "w") as f:
        json.dump(splits, f)
    with open(os.path.join(data_dir, "test_split_L100.json"), "w") as f:
        json.dump({"test": names[6:7]}, f)
    with open(os.path.join(data_dir, "test_split_sc.json"), "w") as f:
        json.dump({"test": names[7:]}, f)


@pytest.mark.parametrize("autoregressive", [False, True])
def test_cpd_cli_training(tmp_path, monkeypatch, autoregressive):
    import random
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import train as train_cli

    monkeypatch.setenv("PROJECT_ROOT", str(tmp_path))
    rng = np.random.default_rng(0)
    random.seed(0)
    data_dir = str(tmp_path / "CATH")
    _write_fixture(data_dir, rng)

    metrics = train_cli.main(
        [
            "experiment=gcpnet_cpd",
            "trainer.accelerator=cpu",
            "trainer.max_epochs=2",
            "trainer.min_epochs=0",
            "trainer.accumulate_grad_batches=1",
            f"datamodule.data_dir={data_dir}",
            "datamodule.batch_size=4",
            f"model.autoregressive_decoder={str(autoregressive).lower()}",
            "model.model_cfg.h_hidden_dim=16",
            "model.model_cfg.chi_hidden_dim=4",
            "model.model_cfg.e_hidden_dim=16",
            "model.model_cfg.num_encoder_layers=1",
            "model.model_cfg.num_decoder_layers=1",
            "model.layer_cfg.mp_cfg.num_message_layers=2",
            "callbacks.early_stopping.patience=100",
        ]
    )
    assert np.isfinite(metrics["test/loss"])
    # CE over 20 classes: untrained ~ log(20) = 3.0
    assert metrics["test/loss"] < 10.0