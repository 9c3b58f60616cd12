"""Optimizer and LR-schedule builders.

Covers the reference's optimizer surface (configs/model/gcpnet_*.yaml:
Adam with lr/weight_decay; optional StepLR / ReduceLROnPlateau schedulers;
``accumulate_grad_batches`` via optax.MultiSteps; SURVEY.md §2.8).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import optax


def build_optimizer(cfg: Dict[str, Any]) -> optax.GradientTransformation:
    """cfg mirrors the reference optimizer block: {_target_, lr,
    weight_decay, ...}."""
    name = str(cfg.get("_target_", "torch.optim.Adam")).rsplit(".", 1)[-1].lower()
    lr = float(cfg.get("lr", 1e-4))
    weight_decay = float(cfg.get("weight_decay", 0.0))

    schedule = cfg.get("_schedule_", None)
    lr_or_schedule = schedule if schedule is not None else lr

    if name == "adam":
        # torch.optim.Adam applies *coupled* L2: the decay term is added to
        # the gradient before the moment updates (unlike AdamW's decoupled
        # decay) — matters for AR (wd=1e-3) and CPD (wd=1e-8) dynamics.
        adam = optax.adam(
            lr_or_schedule,
            b1=float(cfg.get("beta1", 0.9)),
            b2=float(cfg.get("beta2", 0.999)),
        )
        if weight_decay:
            tx = optax.chain(
                optax.add_decayed_weights(weight_decay), adam
            )
        else:
            tx = adam
    elif name == "adamw":
        tx = optax.adamw(lr_or_schedule, weight_decay=weight_decay)
    elif name == "sgd":
        tx = optax.sgd(lr_or_schedule, momentum=float(cfg.get("momentum", 0.0)))
    else:
        raise ValueError(f"unsupported optimizer {name!r}")

    accumulate = int(cfg.get("accumulate_grad_batches", 1) or 1)
    if accumulate > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate)
    return tx


def _eval_arith(value) -> float:
    """Evaluate simple arithmetic in config values — the reference needs an
    ``eval()`` workaround for expressions like
    ``step_size: ${trainer.min_epochs} // 8`` (src/train.py:150-153)."""
    if isinstance(value, (int, float)):
        return value
    text = str(value)
    if not all(c in "0123456789.+-*/() e" for c in text):
        raise ValueError(f"unsupported arithmetic expression {text!r}")
    return eval(text, {"__builtins__": {}}, {})  # noqa: S307 - sanitized


def build_schedule(
    scheduler_cfg: Optional[Dict[str, Any]], base_lr: float
) -> Optional[optax.Schedule]:
    """StepLR-style schedules resolve to optax schedules; plateau scheduling
    is epoch-driven on the host (see Trainer)."""
    if not scheduler_cfg:
        return None
    name = str(scheduler_cfg.get("_target_", "")).rsplit(".", 1)[-1].lower()
    if name == "steplr":
        step_size = int(_eval_arith(scheduler_cfg["step_size"]))
        gamma = float(scheduler_cfg.get("gamma", 0.9))
        return optax.exponential_decay(
            init_value=base_lr,
            transition_steps=step_size,
            decay_rate=gamma,
            staircase=True,
        )
    if name == "reducelronplateau":
        return None  # handled on host by the Trainer (plateau controller)
    raise ValueError(f"unsupported scheduler {name!r}")


class PlateauController:
    """Host-side ReduceLROnPlateau: tracks the monitored metric per epoch
    and yields an LR scale factor applied via optax.scale_by_schedule
    injection (we rebuild the optimizer multiplier)."""

    def __init__(
        self, factor: float = 0.1, patience: int = 10, mode: str = "min"
    ):
        self.factor = factor
        self.patience = patience
        self.mode = mode
        self.best = None
        self.bad_epochs = 0
        self.scale = 1.0

    def update(self, value: float) -> float:
        improved = (
            self.best is None
            or (self.mode == "min" and value < self.best)
            or (self.mode == "max" and value > self.best)
        )
        if improved:
            self.best = value
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale *= self.factor
                self.bad_epochs = 0
        return self.scale
