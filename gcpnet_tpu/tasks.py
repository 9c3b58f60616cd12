"""Task wiring: composed config -> (model, loss, metric collection).

The glue the reference spreads across its LightningModules' constructors
and epoch hooks (SURVEY.md §2.3), expressed as pure builders keyed by task.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import numpy as np

from gcpnet_tpu.config.schema import LayerCfg, ModelCfg, ModuleCfg
from gcpnet_tpu.graph import GraphBatch
from gcpnet_tpu.models import LOSS_REGISTRY, MODEL_REGISTRY
from gcpnet_tpu.train import metrics as M

TASK_OF_MODEL = {
    "GCPNetLBA": "lba",
    "GCPNetPSR": "psr",
    "GCPNetCPD": "cpd",
    "GCPNetNMS": "nms",
    "GCPNetRS": "rs",
    "GCPNetEQ": "eq",
    "GCPNetAR": "ar",
}

MODEL_OF_TASK = {v: k for k, v in TASK_OF_MODEL.items()}


def model_name_from_target(target: str) -> str:
    """Resolve a config ``_target_`` to its registry NAME (not the class
    __name__: GCPNetPSR aliases the GCPNetLBA class but keeps PSR-specific
    metrics/wiring)."""
    short = target.rsplit(".", 1)[-1]
    if short in MODEL_OF_TASK.values() or short in TASK_OF_MODEL:
        return short
    # reference-style targets: src.models.gcpnet_psr_module.GCPNetPSRLitModule
    for key in TASK_OF_MODEL:
        if key.lower().replace("gcpnet", "") in short.lower():
            return key
    from gcpnet_tpu.config.instantiate import resolve_target

    return resolve_target(target).__name__


def build_model(model_block: Dict[str, Any]):
    """Build the task model from the composed ``model:`` config block
    (reference four-level schema: model_cfg/module_cfg/layer_cfg{mp_cfg})."""
    name = model_name_from_target(str(model_block["_target_"]))
    cls = MODEL_REGISTRY[name]

    model_cfg = ModelCfg.from_dict(model_block.get("model_cfg", {}))
    module_cfg = ModuleCfg.from_dict(model_block.get("module_cfg", {}))
    layer_cfg = LayerCfg.from_dict(model_block.get("layer_cfg", {}))

    layer_class = "GCPInteractions"
    lc = model_block.get("layer_class", {})
    if isinstance(lc, dict) and "_target_" in lc:
        layer_class = str(lc["_target_"]).rsplit(".", 1)[-1]

    kwargs: Dict[str, Any] = dict(
        model_cfg=model_cfg,
        module_cfg=module_cfg,
        layer_cfg=layer_cfg,
        layer_class=layer_class,
    )
    if name == "GCPNetCPD":
        kwargs["autoregressive_decoder"] = bool(
            model_block.get("autoregressive_decoder", False)
        )
        if "node_input_dims" in model_block:
            kwargs["node_input_dims"] = tuple(model_block["node_input_dims"])
        if "edge_input_dims" in model_block:
            kwargs["edge_input_dims"] = tuple(model_block["edge_input_dims"])
    if name in ("GCPNetLBA", "GCPNetPSR"):
        kwargs["num_atom_types"] = int(model_block.get("num_atom_types", 9))
    model = cls(**kwargs)
    return model, name


def build_loss(model_name: str) -> Callable:
    return LOSS_REGISTRY[model_name]


def _graph_collect(collector, out, batch: GraphBatch):
    collector.add(
        out,
        batch.extras["label"],
        mask=batch.graph_pad_mask,
        groups=batch.extras.get("target_id"),
    )


def _node_pos_collect(collector, out, batch: GraphBatch):
    mask3 = np.repeat(np.asarray(batch.valid_node_mask()), 3)
    collector.add(out, batch.extras["label"], mask=mask3)


def _eq_collect(collector, out, batch: GraphBatch):
    collector.add(out, batch.extras["label"], mask=batch.extras["res_mask"])


def _cpd_collect(collector, out, batch: GraphBatch):
    logits, _ = out
    pred_cls = np.argmax(np.asarray(logits), axis=-1)
    collector.add(pred_cls, batch.extras["seq"], mask=batch.valid_node_mask())


def build_collect(model_name: str) -> Optional[Callable]:
    if model_name in ("GCPNetLBA", "GCPNetPSR", "GCPNetRS"):
        return _graph_collect
    if model_name in ("GCPNetNMS", "GCPNetAR"):
        return _node_pos_collect
    if model_name == "GCPNetEQ":
        return _eq_collect
    if model_name == "GCPNetCPD":
        return _cpd_collect
    return None


def _cosine3(p: np.ndarray, l: np.ndarray) -> float:
    return M.cosine_similarity(p.reshape(-1, 3), l.reshape(-1, 3))


def _recovery(p: np.ndarray, l: np.ndarray) -> float:
    return float((p.astype(int) == l.astype(int)).mean()) if p.size else float("nan")


def build_metric_fns(model_name: str) -> Dict[str, Callable]:
    task = TASK_OF_MODEL[model_name]
    if task in ("lba",):
        return {
            "RMSE": M.rmse,
            "PearsonCorrCoef": M.pearson,
            "SpearmanCorrCoef": M.spearman,
        }
    if task == "psr":
        return {
            "RMSE": M.rmse,
            "PearsonCorrCoef": M.pearson,
            "SpearmanCorrCoef": M.spearman,
            "grouped": M.grouped_correlations,
        }
    if task == "nms":
        return {"RMSE": M.rmse, "CosineSimilarity": _cosine3}
    if task == "rs":
        return {"Accuracy": M.accuracy, "F1": M.f1}
    if task == "eq":
        return {"RMSE": M.rmse, "PearsonCorrCoef": M.pearson}
    if task == "ar":
        return {"RMSE": M.rmse}
    if task == "cpd":
        return {"recovery_argmax": _recovery}
    return {}
