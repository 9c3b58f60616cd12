#!/usr/bin/env python
"""Prediction entry point (reference src/predict.py:54-118): restore a
checkpoint and run inference over a directory of inputs; EQ writes
b-factor-annotated PDBs plus a predictions CSV, AR writes refined PDBs.

    python predict.py model=gcpnet_eq datamodule=eq ckpt_path=... \\
        datamodule.predict_input_dir=... datamodule.predict_output_dir=...
"""

import csv
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

from gcpnet_tpu.config.loader import compose
from gcpnet_tpu.utils.pylogger import get_pylogger
from gcpnet_tpu.utils.utils import task_wrapper

log = get_pylogger("predict")

CONFIG_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "configs")


@task_wrapper
def predict(cfg):
    import jax
    from gcpnet_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()

    from train import _make_mesh_from_cfg, build_trainer

    from gcpnet_tpu.data.registry import build_datamodule
    from gcpnet_tpu.tasks import build_loss, build_model
    from gcpnet_tpu.train.checkpoints import CheckpointManager

    ckpt_path = cfg.get("ckpt_path")
    if not ckpt_path or ckpt_path == "???":
        raise ValueError("predict requires ckpt_path=<checkpoint dir>")

    mesh = _make_mesh_from_cfg(cfg.get("trainer") or {})
    datamodule = build_datamodule(
        cfg["datamodule"], num_shards=1, seed=int(cfg.get("seed", 42))
    )
    datamodule.prepare_data()
    datamodule.setup(stage="predict")

    model, model_name = build_model(cfg["model"])
    loss_fn = build_loss(model_name)
    trainer = build_trainer(cfg, model, loss_fn, model_name, mesh)

    batches = list(datamodule.predict_batches())
    if not batches:
        raise RuntimeError("no prediction inputs found")
    trainer.init_state(trainer._put(batches[0]))
    mgr = CheckpointManager(ckpt_path, monitor="val/loss")
    restored = mgr.restore_best(trainer.state) or mgr.restore_last(trainer.state)
    if restored is None:
        raise FileNotFoundError(f"no checkpoint found under {ckpt_path}")
    trainer.state = restored

    out_dir = cfg["datamodule"].get("predict_output_dir") or "predictions"
    os.makedirs(out_dir, exist_ok=True)
    # per-rank CSV (reference writes rank_{global_rank} files,
    # gcpnet_eq_module.py:428-431)
    rank = jax.process_index()
    default_name = (
        "predictions.csv" if rank == 0 else f"predictions_rank_{rank}.csv"
    )
    csv_path = cfg.get("predictions_csv_path") or os.path.join(
        out_dir, default_name
    )

    rows = []
    for batch in batches:
        out = model.apply(
            {"params": trainer.state.params}, trainer._put(batch), True
        )
        preds = np.asarray(jax.device_get(out))
        rows.extend(
            datamodule.record_predictions(batch, preds, output_dir=out_dir)
        )

    if rows:
        with open(csv_path, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=sorted(rows[0].keys()))
            writer.writeheader()
            writer.writerows(rows)
        log.info(f"wrote {len(rows)} prediction rows to {csv_path}")

        # run-attached molecule table when a W&B logger is configured
        from gcpnet_tpu.utils.loggers import WandbLogger, instantiate_loggers

        for logger in instantiate_loggers(cfg.get("logger")):
            if isinstance(logger, WandbLogger):
                pdb_key = (
                    "refined_pdb"
                    if any("refined_pdb" in r for r in rows)
                    else "annotated_pdb"
                )
                logger.log_molecule_table(
                    "predictions", rows, pdb_key=pdb_key
                )
            logger.finalize()
    return {"num_predictions": len(rows)}, trainer


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    cfg = compose(CONFIG_DIR, "predict.yaml", argv)
    metrics, _ = predict(cfg)
    return metrics


if __name__ == "__main__":
    main()
