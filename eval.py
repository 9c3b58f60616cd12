#!/usr/bin/env python
"""Evaluation entry point (reference src/eval.py:54-117): compose the
config, restore the checkpoint, run the test loop.

    python eval.py datamodule=nms model=gcpnet_nms ckpt_path=...
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from gcpnet_tpu.config.loader import compose
from gcpnet_tpu.utils.pylogger import get_pylogger
from gcpnet_tpu.utils.utils import task_wrapper

log = get_pylogger("eval")

CONFIG_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "configs")


@task_wrapper
def evaluate(cfg):
    from gcpnet_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()

    from train import _make_mesh_from_cfg, build_trainer

    from gcpnet_tpu.data.registry import build_datamodule
    from gcpnet_tpu.tasks import build_loss, build_model
    from gcpnet_tpu.train.checkpoints import CheckpointManager

    ckpt_path = cfg.get("ckpt_path")
    if not ckpt_path or ckpt_path == "???":
        raise ValueError("eval requires ckpt_path=<checkpoint dir>")

    mesh = _make_mesh_from_cfg(cfg.get("trainer") or {})
    datamodule = build_datamodule(
        cfg["datamodule"], num_shards=mesh.devices.size,
        seed=int(cfg.get("seed", 42)),
    )
    datamodule.prepare_data()
    datamodule.setup()

    model, model_name = build_model(cfg["model"])
    loss_fn = build_loss(model_name)
    trainer = build_trainer(cfg, model, loss_fn, model_name, mesh)

    example = next(iter(datamodule.val_batches()))
    trainer.init_state(trainer._put(example))
    mgr = CheckpointManager(ckpt_path, monitor="val/loss")
    restored = mgr.restore_best(trainer.state) or mgr.restore_last(
        trainer.state
    )
    if restored is None:
        raise FileNotFoundError(f"no checkpoint found under {ckpt_path}")
    trainer.state = restored

    metrics = trainer.test(datamodule)

    # CPD: per-chain perplexity + autoregressive sequence recovery over the
    # short/single_chain/all subsets (reference gcpnet_cpd_module test
    # protocol)
    if model_name == "GCPNetCPD" and hasattr(datamodule, "named_graphs"):
        from gcpnet_tpu.models.cpd_eval import evaluate_cpd

        cpd_metrics = evaluate_cpd(
            model,
            trainer.state.params,
            datamodule.named_graphs("test"),
            custom_splits=getattr(datamodule, "custom_splits", None),
            num_samples=int(cfg.get("cpd_num_samples", 100)),
            compute_recovery=bool(
                (cfg.get("model") or {}).get("autoregressive_decoder", False)
            ),
        )
        metrics.update(cpd_metrics)
        log.info(f"CPD metrics: {cpd_metrics}")
    return metrics, trainer


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    cfg = compose(CONFIG_DIR, "eval.yaml", argv)
    metrics, _ = evaluate(cfg)
    return metrics


if __name__ == "__main__":
    main()
