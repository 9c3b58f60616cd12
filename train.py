#!/usr/bin/env python
"""Training entry point.

The analog of the reference's ``src/train.py`` (hydra main :148, train()
:57-145): compose the config, instantiate datamodule/model/trainer, fit,
then test with the best checkpoint.  CLI grammar matches the reference:

    python train.py experiment=gcpnet_nms_small trainer.max_epochs=100
    python train.py -m experiment=gcpnet_lba,gcpnet_psr   (multirun)
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from gcpnet_tpu.config.loader import compose
from gcpnet_tpu.utils.pylogger import get_pylogger
from gcpnet_tpu.utils.utils import (
    get_metric_value,
    task_wrapper,
    write_halt_file,
)

log = get_pylogger("train")

CONFIG_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "configs")


def _make_mesh_from_cfg(trainer_cfg):
    import jax
    from gcpnet_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()

    from gcpnet_tpu.parallel import make_mesh

    # multi-host: extend the dp mesh over DCN (SURVEY.md §2.8) — the
    # coordinator address/process counts come from the cluster environment
    if int(trainer_cfg.get("num_nodes", 1) or 1) > 1:
        try:
            jax.distributed.initialize()
            log.info(
                f"jax.distributed initialized: process "
                f"{jax.process_index()}/{jax.process_count()}"
            )
        except Exception as exc:
            log.warning(f"jax.distributed.initialize failed: {exc}")

    accelerator = str(trainer_cfg.get("accelerator", "tpu"))
    if accelerator == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    devices = trainer_cfg.get("devices", 1)
    avail = jax.devices()
    n = len(avail) if devices in (-1, "auto", "-1") else int(devices)
    n = min(n, len(avail))
    return make_mesh(avail[:n])


def build_trainer(cfg, model, loss_fn, model_name, mesh):
    from gcpnet_tpu.tasks import build_collect, build_metric_fns
    from gcpnet_tpu.train import Trainer
    from gcpnet_tpu.utils.loggers import instantiate_loggers

    trainer_cfg = cfg.get("trainer") or {}
    callbacks = cfg.get("callbacks") or {}
    ckpt_cb = callbacks.get("model_checkpoint") or {}
    es_cb = callbacks.get("early_stopping") or {}
    model_block = cfg.get("model") or {}
    opt_cfg = dict(model_block.get("optimizer") or {"_target_": "Adam", "lr": 1e-4})
    opt_cfg["accumulate_grad_batches"] = trainer_cfg.get(
        "accumulate_grad_batches", 1
    )
    sched_cfg = model_block.get("scheduler") or None

    fast_dev_run = bool(trainer_cfg.get("fast_dev_run", False))
    max_epochs = 1 if fast_dev_run else int(trainer_cfg.get("max_epochs", 1))
    max_steps = 1 if fast_dev_run else None
    limit = trainer_cfg.get("limit_train_batches")
    if limit and not fast_dev_run:
        max_steps = max(1, int(float(limit))) if float(limit) >= 1 else None

    output_dir = (cfg.get("paths") or {}).get("output_dir") or "logs/run"
    ckpt_dir = None
    if cfg.get("train", True) and not fast_dev_run:
        ckpt_dir = ckpt_cb.get("dirpath") or os.path.join(
            output_dir, "checkpoints"
        )

    module_cfg = model_block.get("module_cfg") or {}
    trainer = Trainer(
        model,
        loss_fn,
        optimizer_cfg=opt_cfg,
        scheduler_cfg=sched_cfg,
        max_epochs=max_epochs,
        min_epochs=0 if fast_dev_run else int(trainer_cfg.get("min_epochs", 0)),
        mesh=mesh,
        adaptive_clip=bool(module_cfg.get("clip_gradients", False)),
        checkpoint_dir=ckpt_dir,
        monitor=ckpt_cb.get("monitor", "val/loss"),
        monitor_mode=ckpt_cb.get("mode", "min"),
        early_stopping_patience=es_cb.get("patience", 10) if es_cb else None,
        save_top_k=int(ckpt_cb.get("save_top_k", 30) or 30),
        seed=int(cfg.get("seed", 42)),
        collect_fn=build_collect(model_name),
        metric_fns=build_metric_fns(model_name),
        log_dir=output_dir,
        max_steps_per_epoch=max_steps,
        check_val_every_n_epoch=int(
            trainer_cfg.get("check_val_every_n_epoch", 1)
        ),
        loggers=instantiate_loggers(cfg.get("logger")),
        profiler_trace_dir=trainer_cfg.get("profiler_trace_dir")
        if trainer_cfg.get("profiler")
        else None,
        precision=int(trainer_cfg.get("precision", 32) or 32),
        scan_chunk_size=int(trainer_cfg.get("scan_chunk_size", 1) or 1),
        checkpoint_every_n_steps=(
            (callbacks.get("n_step_model_checkpoint") or {}).get(
                "save_frequency"
            )
        ),
    )
    return trainer


@task_wrapper
def train(cfg):
    import numpy as np

    from gcpnet_tpu.data.registry import build_datamodule
    from gcpnet_tpu.tasks import build_loss, build_model

    seed = int(cfg.get("seed", 42))
    np.random.seed(seed)

    mesh = _make_mesh_from_cfg(cfg.get("trainer") or {})
    log.info(f"devices: {mesh.devices.size}")

    datamodule = build_datamodule(
        cfg["datamodule"], num_shards=mesh.devices.size, seed=seed
    )
    datamodule.prepare_data()
    datamodule.setup()

    model, model_name = build_model(cfg["model"])
    loss_fn = build_loss(model_name)
    trainer = build_trainer(cfg, model, loss_fn, model_name, mesh)

    # log the composed hyperparameters to every logger backend
    # (reference utils.log_hyperparameters, src/utils/utils.py:143-183)
    for lg in trainer.loggers:
        try:
            lg.log_hyperparams(
                {
                    "model": cfg.get("model"),
                    "datamodule": cfg.get("datamodule"),
                    "trainer": cfg.get("trainer"),
                    "seed": seed,
                    "tags": cfg.get("tags"),
                }
            )
        except Exception:
            pass

    metrics = {}
    if cfg.get("train", True):
        resume = cfg.get("ckpt_path") is not None
        metrics.update(trainer.fit(datamodule, resume=resume))
        write_halt_file(cfg, run_id=f"{cfg.get('task_name', 'train')}_{seed}")

    if cfg.get("test", True):
        if trainer.ckpt is not None and trainer.ckpt.best_step is not None:
            restored = trainer.ckpt.restore_best(trainer.state)
            if restored is not None:
                trainer.state = restored
                log.info(f"testing with best checkpoint (step {trainer.ckpt.best_step})")
        metrics.update(trainer.test(datamodule))

    return metrics, trainer


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    multirun = False
    if "-m" in argv:
        argv.remove("-m")
        multirun = True
    if "--multirun" in argv:
        argv.remove("--multirun")
        multirun = True

    # hparams_search sweep: `python train.py -m hparams_search=lba_optuna`
    hp_sel = [ov for ov in argv if ov.startswith("hparams_search=")]
    if multirun and hp_sel:
        cfg = compose(CONFIG_DIR, "train.yaml", argv)
        hs = cfg.get("hparams_search") or {}
        from gcpnet_tpu.utils.sweeps import run_search

        def objective(params):
            run_overrides = [ov for ov in argv if not ov.startswith("hparams_search=")]
            run_overrides += [f"{k}={v}" for k, v in params.items()]
            run_cfg = compose(CONFIG_DIR, "train.yaml", run_overrides)
            metrics, _ = train(run_cfg)
            # free compiled executables + pinned device buffers between
            # trials: stale jit caches degrade subsequent runs badly on
            # single-chip setups
            import jax
            from gcpnet_tpu.utils.jax_setup import enable_compilation_cache
            enable_compilation_cache()

            jax.clear_caches()
            return metrics.get(cfg.get("optimized_metric", "val/loss"))

        best_params, best_value, _ = run_search(
            objective,
            hs.get("params", {}),
            n_trials=int(hs.get("n_trials", 25)),
            direction=hs.get("direction", "minimize"),
            seed=int(hs.get("sampler_seed", 1234)),
        )
        log.info(f"best: {best_params} -> {best_value}")
        return {"best_params": best_params, "best_value": best_value}

    if multirun:
        # expand comma-separated sweeps over the cartesian product
        import itertools

        keys, options = [], []
        fixed = []
        for ov in argv:
            if "=" in ov and "," in ov.split("=", 1)[1]:
                k, v = ov.split("=", 1)
                keys.append(k)
                options.append(v.split(","))
            else:
                fixed.append(ov)
        results = []
        for combo in itertools.product(*options):
            run_overrides = fixed + [f"{k}={v}" for k, v in zip(keys, combo)]
            log.info(f"multirun: {run_overrides}")
            cfg = compose(CONFIG_DIR, "train.yaml", run_overrides)
            metrics, _ = train(cfg)
            results.append(metrics)
            import jax
            from gcpnet_tpu.utils.jax_setup import enable_compilation_cache
            enable_compilation_cache()

            jax.clear_caches()
        return results

    cfg = compose(CONFIG_DIR, "train.yaml", argv)
    metrics, _ = train(cfg)
    optimized = cfg.get("optimized_metric")
    value = get_metric_value(metrics, optimized)
    if value is not None:
        print(f"optimized_metric {optimized}={value}")
    return metrics


if __name__ == "__main__":
    main()
