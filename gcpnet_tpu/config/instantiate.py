"""``_target_`` resolution: registry first, importlib fallback.

The reference instantiates classes from config via
``hydra.utils.instantiate`` (src/train.py:79-101); here the same
``_target_``/``_partial_`` convention resolves through a name registry (so
reference-style target strings keep working) or a dotted import.
"""

from __future__ import annotations

import functools
import importlib
from typing import Any, Dict


def resolve_target(target: str):
    from gcpnet_tpu.models import MODEL_REGISTRY

    if target in MODEL_REGISTRY:
        return MODEL_REGISTRY[target]
    short = target.rsplit(".", 1)[-1]
    if short in MODEL_REGISTRY:
        return MODEL_REGISTRY[short]

    # known class-name aliases from the reference tree
    alias_modules = {
        "GCP": "gcpnet_tpu.nn.gcp",
        "GCP2": "gcpnet_tpu.nn.gcp",
        "GCP3": "gcpnet_tpu.nn.gcp",
        "GCPInteractions": "gcpnet_tpu.nn.interactions",
        "GCPInteractions2": "gcpnet_tpu.nn.interactions",
        "NMSDataModule": "gcpnet_tpu.data.nms",
        "ATOM3DDataModule": "gcpnet_tpu.data.atom3d",
        "CATHDataModule": "gcpnet_tpu.data.cath",
        "RSDataModule": "gcpnet_tpu.data.rs",
        "EQDataModule": "gcpnet_tpu.data.eq",
        "ARDataModule": "gcpnet_tpu.data.ar",
    }
    if short in alias_modules:
        mod = importlib.import_module(alias_modules[short])
        return getattr(mod, short)

    module_name, _, attr = target.rpartition(".")
    try:
        mod = importlib.import_module(module_name)
        return getattr(mod, attr)
    except (ImportError, AttributeError) as exc:
        raise ImportError(f"cannot resolve _target_ '{target}'") from exc


def instantiate(cfg: Dict[str, Any], **kwargs):
    """Instantiate a config node carrying ``_target_`` (optionally
    ``_partial_``); non-target dict values are passed through as-is."""
    if not isinstance(cfg, dict) or "_target_" not in cfg:
        raise ValueError(f"instantiate() needs a dict with _target_, got {cfg!r}")
    cfg = dict(cfg)
    target = cfg.pop("_target_")
    partial = bool(cfg.pop("_partial_", False))
    cls = resolve_target(str(target))
    cfg.update(kwargs)
    if partial:
        return functools.partial(cls, **cfg)
    return cls(**cfg)
