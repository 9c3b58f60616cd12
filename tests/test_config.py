"""Config-system tests: composition, experiments, interpolation, overrides
— the analog of the reference's tests/test_configs.py."""

import os

import pytest

from gcpnet_tpu.config.loader import ConfigError, compose
from gcpnet_tpu.config.schema import LayerCfg, ModelCfg, ModuleCfg

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_compose_default_train():
    cfg = compose(CONFIG_DIR, "train.yaml")
    assert cfg["task_name"] == "train"
    assert cfg["datamodule"]["task"] == "LBA"
    assert cfg["model"]["model_cfg"]["h_hidden_dim"] == 100
    assert cfg["model"]["module_cfg"]["nonlinearities"] == ["relu", None]
    assert cfg["trainer"]["max_epochs"] == 1000
    assert cfg["callbacks"]["model_checkpoint"]["save_top_k"] == 30


def test_experiment_package_overrides_groups():
    cfg = compose(CONFIG_DIR, "train.yaml", ["experiment=gcpnet_nms_small"])
    assert "NMSDataModule" in cfg["datamodule"]["_target_"]
    assert cfg["datamodule"]["data_mode"] == "small"
    assert cfg["model"]["model_cfg"]["h_hidden_dim"] == 64
    assert cfg["trainer"]["max_epochs"] == 12000
    assert cfg["model"]["layer_cfg"]["mp_cfg"]["num_message_layers"] == 8


def test_every_experiment_composes():
    exp_dir = os.path.join(CONFIG_DIR, "experiment")
    for fname in sorted(os.listdir(exp_dir)):
        name = fname[: -len(".yaml")]
        cfg = compose(CONFIG_DIR, "train.yaml", [f"experiment={name}"])
        assert "_target_" in cfg["model"], name
        assert "_target_" in cfg["datamodule"], name


def test_cli_value_overrides_and_group_selection():
    cfg = compose(
        CONFIG_DIR,
        "train.yaml",
        [
            "trainer=cpu",
            "model.model_cfg.num_encoder_layers=3",
            "seed=7",
            "tags=[a,b]",
        ],
    )
    assert cfg["trainer"]["accelerator"] == "cpu"
    assert cfg["model"]["model_cfg"]["num_encoder_layers"] == 3
    assert cfg["seed"] == 7
    assert cfg["tags"] == ["a", "b"]


def test_interpolation_chain(monkeypatch):
    monkeypatch.setenv("PROJECT_ROOT", "/tmp/x")
    cfg = compose(CONFIG_DIR, "train.yaml")
    assert cfg["paths"]["output_dir"] == "/tmp/x/logs/train/runs"
    assert cfg["callbacks"]["model_checkpoint"]["dirpath"].startswith("/tmp/x")


def test_unknown_experiment_raises():
    with pytest.raises(ConfigError):
        compose(CONFIG_DIR, "train.yaml", ["experiment=does_not_exist"])


def test_deletion_override():
    cfg = compose(CONFIG_DIR, "train.yaml", ["~callbacks.early_stopping"])
    assert "early_stopping" not in cfg["callbacks"]


def test_schema_dataclasses_from_composed_cfg():
    cfg = compose(CONFIG_DIR, "train.yaml", ["experiment=gcpnet_eq"])
    model_block = cfg["model"]
    mc = ModelCfg.from_dict(model_block["model_cfg"])
    assert mc.h_input_dim == 1281
    mo = ModuleCfg.from_dict(model_block["module_cfg"])
    assert mo.selected_gcp == "GCP3"
    lc = LayerCfg.from_dict(model_block["layer_cfg"])
    assert lc.use_scalar_message_attention and lc.aggregate_with_row
    assert lc.num_feedforward_layers == 1


def test_eval_and_predict_compose():
    for name in ("eval.yaml", "predict.yaml"):
        cfg = compose(CONFIG_DIR, name, ["ckpt_path=/tmp/ck"])
        assert cfg["ckpt_path"] == "/tmp/ck"


def test_debug_profiles_compose():
    for profile in ("default", "fdr", "limit", "overfit", "profiler"):
        cfg = compose(CONFIG_DIR, "train.yaml", [f"debug={profile}"])
        assert cfg["trainer"]["accelerator"] == "cpu", profile
