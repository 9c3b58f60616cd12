"""Experiment loggers.

The reference supports many Lightning logger backends
(configs/logger/*, SURVEY.md §5.5).  Here CSV is first-class; TensorBoard
writes event files when the package is importable; WandB runs in offline
mode when available.  All degrade to no-ops rather than failing in a
zero-egress environment.
"""

from __future__ import annotations

import csv
import os
from typing import Dict, Optional


class BaseLogger:
    def log_metrics(self, metrics: Dict, step: Optional[int] = None):
        raise NotImplementedError

    def log_hyperparams(self, params: Dict):
        pass

    def finalize(self):
        pass


class CSVLogger(BaseLogger):
    def __init__(self, save_dir: str, name: str = "csv/", prefix: str = ""):
        self.dir = os.path.join(save_dir, name)
        os.makedirs(self.dir, exist_ok=True)
        self.prefix = prefix
        self.path = os.path.join(self.dir, "metrics.csv")
        self._fieldnames = None

    def log_metrics(self, metrics: Dict, step: Optional[int] = None):
        row = {f"{self.prefix}{k}": v for k, v in metrics.items()}
        if step is not None:
            row["step"] = step
        write_header = self._fieldnames is None and not os.path.exists(self.path)
        if self._fieldnames is None:
            self._fieldnames = sorted(row.keys())
        for k in row:
            if k not in self._fieldnames:
                self._fieldnames.append(k)
        with open(self.path, "a", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=self._fieldnames, extrasaction="ignore")
            if write_header:
                writer.writeheader()
            writer.writerow(row)

    def log_hyperparams(self, params: Dict):
        import json

        with open(os.path.join(self.dir, "hparams.json"), "w") as f:
            json.dump(params, f, indent=2, default=str)


class TensorBoardLogger(BaseLogger):
    def __init__(self, save_dir: str, **kwargs):
        self.writer = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            os.makedirs(save_dir, exist_ok=True)
            self.writer = SummaryWriter(save_dir)
        except Exception:
            pass

    def log_metrics(self, metrics: Dict, step: Optional[int] = None):
        if self.writer is None:
            return
        for k, v in metrics.items():
            if isinstance(v, (int, float)):
                self.writer.add_scalar(k, v, global_step=step or 0)

    def finalize(self):
        if self.writer is not None:
            self.writer.close()


class WandbLogger(BaseLogger):
    def __init__(self, offline: bool = True, project: str = "gcpnet-tpu", **kwargs):
        self.run = None
        try:
            import wandb

            mode = "offline" if offline else "online"
            self.run = wandb.init(project=project, mode=mode, **{
                k: v for k, v in kwargs.items()
                if k in ("id", "group", "tags", "job_type") and v
            })
        except Exception:
            pass

    def log_metrics(self, metrics: Dict, step: Optional[int] = None):
        if self.run is not None:
            self.run.log(metrics, step=step)

    def log_hyperparams(self, params: Dict):
        if self.run is not None:
            self.run.config.update(params, allow_val_change=True)

    def log_molecule_table(self, name: str, rows, pdb_key: str = "annotated_pdb"):
        """Run-attached molecule table: each row's ``pdb_key`` PDB becomes a
        ``wandb.Molecule`` next to its metric columns (the reference's W&B
        tables, gcpnet_ar_module.py:331-362, gcpnet_eq_module.py:424-472)."""
        if self.run is None or not rows:
            return
        try:
            import wandb

            columns = sorted(rows[0].keys())
            table = wandb.Table(columns=columns + ["molecule"])
            for row in rows:
                mol = None
                path = row.get(pdb_key)
                if path:
                    try:
                        mol = wandb.Molecule(path)
                    except Exception:
                        mol = None
                table.add_data(*[row.get(c) for c in columns], mol)
            self.run.log({name: table})
        except Exception:
            pass

    def finalize(self):
        if self.run is not None:
            self.run.finish()


class CometLogger(BaseLogger):
    """comet.ml backend (reference configs/logger/comet.yaml); degrades to
    a no-op when comet_ml is not installed."""

    def __init__(self, project_name: str = "GCPNet", offline: bool = True,
                 save_dir: Optional[str] = None, **kwargs):
        self.exp = None
        try:
            import comet_ml

            cls = comet_ml.OfflineExperiment if offline else comet_ml.Experiment
            self.exp = cls(
                project_name=project_name,
                offline_directory=save_dir or ".",
            )
        except Exception:
            pass

    def log_metrics(self, metrics: Dict, step: Optional[int] = None):
        if self.exp is not None:
            self.exp.log_metrics(metrics, step=step)

    def log_hyperparams(self, params: Dict):
        if self.exp is not None:
            self.exp.log_parameters(params)

    def finalize(self):
        if self.exp is not None:
            self.exp.end()


class MLFlowLogger(BaseLogger):
    """mlflow backend (reference configs/logger/mlflow.yaml); no-op without
    the mlflow package."""

    def __init__(self, tracking_uri: Optional[str] = None,
                 experiment_name: str = "gcpnet-tpu", **kwargs):
        self.mlflow = None
        try:
            import mlflow

            if tracking_uri:
                mlflow.set_tracking_uri(tracking_uri)
            mlflow.set_experiment(experiment_name)
            mlflow.start_run()
            self.mlflow = mlflow
        except Exception:
            pass

    def log_metrics(self, metrics: Dict, step: Optional[int] = None):
        if self.mlflow is not None:
            self.mlflow.log_metrics(
                {k: float(v) for k, v in metrics.items()}, step=step
            )

    def log_hyperparams(self, params: Dict):
        if self.mlflow is not None:
            self.mlflow.log_params(params)

    def finalize(self):
        if self.mlflow is not None:
            self.mlflow.end_run()


class NeptuneLogger(BaseLogger):
    """neptune.ai backend (reference configs/logger/neptune.yaml); no-op
    without the neptune package."""

    def __init__(self, project: Optional[str] = None, **kwargs):
        self.run = None
        try:
            import neptune

            self.run = neptune.init_run(project=project)
        except Exception:
            pass

    def log_metrics(self, metrics: Dict, step: Optional[int] = None):
        if self.run is not None:
            for k, v in metrics.items():
                self.run[k].append(float(v), step=step)

    def log_hyperparams(self, params: Dict):
        if self.run is not None:
            self.run["parameters"] = params

    def finalize(self):
        if self.run is not None:
            self.run.stop()


LOGGER_CLASSES = {
    "CSVLogger": CSVLogger,
    "TensorBoardLogger": TensorBoardLogger,
    "WandbLogger": WandbLogger,
    "CometLogger": CometLogger,
    "MLFlowLogger": MLFlowLogger,
    "NeptuneLogger": NeptuneLogger,
}


def instantiate_loggers(logger_block: Optional[Dict]) -> list:
    """Build loggers from the composed ``logger:`` config block
    (reference src/utils/utils.py:124-140)."""
    loggers = []
    if not logger_block:
        return loggers
    for key, sub in logger_block.items():
        if not isinstance(sub, dict) or "_target_" not in sub:
            continue
        name = str(sub["_target_"]).rsplit(".", 1)[-1]
        cls = LOGGER_CLASSES.get(name)
        if cls is None:
            continue
        kwargs = {k: v for k, v in sub.items() if not k.startswith("_")}
        try:
            loggers.append(cls(**kwargs))
        except Exception:
            pass
    return loggers
