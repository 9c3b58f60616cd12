#!/usr/bin/env python
"""Generate the configs/ YAML tree.

The tree preserves the reference's config schema — group layout, key names,
four-level model configs (model -> model_cfg/module_cfg/layer_cfg{mp_cfg})
and per-task hyperparameter values (SURVEY.md §2.7) — with ``_target_``
strings pointing at gcpnet_tpu classes.  Run from the repo root:

    python scripts/generate_config_tree.py
"""

import os

ROOT = os.path.join(os.path.dirname(__file__), "..", "configs")

TASKS = ["lba", "psr", "cpd", "nms", "rs", "eq", "ar"]

# --- per-task model_cfg values (reference configs/model/model_cfg) ---------
MODEL_CFGS = {
    "lba": dict(chi_input_dim=2, e_input_dim=16, xi_input_dim=1,
                h_hidden_dim=100, chi_hidden_dim=16, e_hidden_dim=32,
                xi_hidden_dim=4, output_dim=1, output_scale_factor=2,
                num_encoder_layers=8, num_decoder_layers=3, dropout=0.1,
                dense_dropout=0.1),
    "psr": dict(chi_input_dim=2, e_input_dim=16, xi_input_dim=1,
                h_hidden_dim=100, chi_hidden_dim=16, e_hidden_dim=32,
                xi_hidden_dim=4, output_dim=1, output_scale_factor=2,
                num_encoder_layers=5, num_decoder_layers=3, dropout=0.1,
                dense_dropout=0.1),
    "cpd": dict(chi_input_dim=2, e_input_dim=16, xi_input_dim=1,
                h_hidden_dim=100, chi_hidden_dim=16, e_hidden_dim=32,
                xi_hidden_dim=4, output_dim=20, num_encoder_layers=9,
                num_decoder_layers=3, dropout=0.2,
                decoder_residual_updates=True),
    "nms": dict(h_input_dim=1, chi_input_dim=3, e_input_dim=17,
                xi_input_dim=1, h_hidden_dim=64, chi_hidden_dim=16,
                e_hidden_dim=32, xi_hidden_dim=4, num_encoder_layers=4,
                num_decoder_layers=3, dropout=0.1),
    "rs": dict(h_input_dim=52, chi_input_dim=2, e_input_dim=30,
               xi_input_dim=1, h_hidden_dim=100, chi_hidden_dim=16,
               e_hidden_dim=32, xi_hidden_dim=4, output_dim=1,
               output_scale_factor=2, num_encoder_layers=8,
               num_decoder_layers=3, dropout=0.1, dense_dropout=0.1),
    "eq": dict(h_input_dim=1281, chi_input_dim=2, e_input_dim=18,
               xi_input_dim=1, h_hidden_dim=100, chi_hidden_dim=16,
               e_hidden_dim=32, xi_hidden_dim=4, output_dim=1,
               output_scale_factor=2, num_encoder_layers=5,
               num_decoder_layers=3, dropout=0.1, dense_dropout=0.1),
    "ar": dict(h_input_dim=1338, chi_input_dim=2, e_input_dim=29,
               xi_input_dim=1, h_hidden_dim=100, chi_hidden_dim=32,
               e_hidden_dim=16, xi_hidden_dim=4, num_encoder_layers=4,
               num_decoder_layers=3, dropout=0.0),
}

# --- per-task module_cfg deltas -------------------------------------------
GCP3_TASKS = {"eq", "ar"}
SCALAR_NONLIN = {"rs": "leakyrelu", "ar": "silu"}
VECTOR_NONLIN = {"ar": "silu"}

MODEL_TARGETS = {
    "lba": "gcpnet_tpu.models.GCPNetLBA",
    "psr": "gcpnet_tpu.models.GCPNetPSR",
    "cpd": "gcpnet_tpu.models.GCPNetCPD",
    "nms": "gcpnet_tpu.models.GCPNetNMS",
    "rs": "gcpnet_tpu.models.GCPNetRS",
    "eq": "gcpnet_tpu.models.GCPNetEQ",
    "ar": "gcpnet_tpu.models.GCPNetAR",
}

LAYER_CLASS = {
    t: ("gcpnet_tpu.nn.GCPInteractions2" if t in GCP3_TASKS
        else "gcpnet_tpu.nn.GCPInteractions")
    for t in TASKS
}


def w(path, text):
    full = os.path.join(ROOT, path)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    with open(full, "w") as f:
        f.write(text.lstrip("\n"))
    print("wrote", path)


def yaml_kv(d, indent=0):
    pad = "  " * indent
    lines = []
    for k, v in d.items():
        if v is None:
            lines.append(f"{pad}{k}:")
        elif isinstance(v, bool):
            lines.append(f"{pad}{k}: {str(v).lower()}")
        else:
            lines.append(f"{pad}{k}: {v}")
    return "\n".join(lines)


def model_cfg_yaml(task):
    return yaml_kv(MODEL_CFGS[task]) + "\n"


def module_cfg_yaml(task):
    gcp = "GCP3" if task in GCP3_TASKS else "GCP2"
    s_nl = SCALAR_NONLIN.get(task, "relu")
    v_nl = VECTOR_NONLIN.get(task)
    lines = [
        "selected_GCP:",
        "  # which GCP module variant to use (GCP, GCP2 or GCP3)",
        f"  _target_: gcpnet_tpu.nn.gcp.{gcp}",
        "  _partial_: true",
        "",
    ]
    if task == "lba":
        lines.append("concatenate_lig_flag: false")
    lines += [
        "norm_x_diff: true",
        "",
        "scalar_gate: 0",
        "vector_gate: true",
        "vector_residual: false",
        "vector_frame_residual: false",
        "frame_gate: false",
        "sigma_frame_gate: false",
        "",
        f"scalar_nonlinearity: {s_nl}",
        f"vector_nonlinearity: {v_nl if v_nl else ''}".rstrip(),
        "",
        "nonlinearities:",
        "  - ${..scalar_nonlinearity}",
        "  - ${..vector_nonlinearity}",
        "",
        "bottleneck: 4",
        "",
        "vector_linear: true",
        "vector_identity: true",
        "",
        "default_vector_residual: false",
        "default_bottleneck: 4",
        "",
    ]
    if task in ("nms", "ar"):
        lines.append("node_positions_weight: 1.0")
        lines.append("")
    lines += [
        "ablate_frame_updates: false",
        "ablate_scalars: false",
        "ablate_vectors: false",
    ]
    if task == "nms":
        lines.append("ablate_x_force_update: true")
    lines += ["", "enable_e3_equivariance: false"]
    if task in GCP3_TASKS:
        lines += ["", "clip_gradients: true"]
    return "\n".join(lines) + "\n"


def layer_cfg_yaml(task):
    lines = [
        "defaults:",
        f"  - mp_cfg: gcp_mp_{task}.yaml",
        "",
        "pre_norm: false",
    ]
    if task in ("eq", "ar"):
        lines += [
            "use_scalar_message_attention: true",
            "aggregate_with_row: true",
            "num_feedforward_layers: 1",
        ]
    else:
        lines.append("num_feedforward_layers: 2")
    lines.append(f"dropout: {0.0 if task == 'ar' else 0.1}")
    lines += ["", "nonlinearity_slope: 1e-2"]
    return "\n".join(lines) + "\n"


def mp_cfg_yaml(task):
    n = 4 if task == "ar" else 8
    return yaml_kv(dict(
        edge_encoder=False, edge_gate=False, num_message_layers=n,
        message_residual=0, message_ff_multiplier=1, self_message=True,
        use_residual_message_gcp=True,
    )) + "\n"


def model_yaml(task):
    extra = ""
    if task == "nms":
        extra = "  updating_node_positions: true\n"
    wd = "1e-8" if task == "cpd" else "0"
    tail = ""
    if task == "cpd":
        tail = (
            "node_input_dims: [6, 3]\n"
            "edge_input_dims: [32, 1]\n\n"
            "# use the autoregressive decoder (direct-shot GCPMLPDecoder"
            " when false)\n"
            "autoregressive_decoder: false\n\n"
        )
    return f"""
_target_: {MODEL_TARGETS[task]}

layer_class:
  _target_: {LAYER_CLASS[task]}
  _partial_: true
{extra}
optimizer:
  _target_: optax.adam
  _partial_: true
  lr: 1e-4
  weight_decay: {wd}

scheduler:  # leave empty to train without a learning-rate scheduler

{tail}defaults:
  - model_cfg: gcp_model_{task}.yaml
  - module_cfg: gcp_module_{task}.yaml
  - layer_cfg: gcp_interaction_layer_{task}.yaml
"""


def main():
    for task in TASKS:
        w(f"model/model_cfg/gcp_model_{task}.yaml", model_cfg_yaml(task))
        w(f"model/module_cfg/gcp_module_{task}.yaml", module_cfg_yaml(task))
        w(
            f"model/layer_cfg/gcp_interaction_layer_{task}.yaml",
            layer_cfg_yaml(task),
        )
        w(f"model/layer_cfg/mp_cfg/gcp_mp_{task}.yaml", mp_cfg_yaml(task))
        w(f"model/gcpnet_{task}.yaml", model_yaml(task))


if __name__ == "__main__":
    main()
