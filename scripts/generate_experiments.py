#!/usr/bin/env python
"""Generate configs/experiment/*.yaml — experiment packages pinning the
reference's per-task best hyperparameters (reference configs/experiment/)."""

import os

ROOT = os.path.join(os.path.dirname(__file__), "..", "configs", "experiment")

HEADER = """# @package _global_

# run with: python train.py experiment={name}

defaults:
  - override /datamodule: {dm}.yaml
  - override /model: gcpnet_{task}.yaml
  - override /callbacks: default.yaml
  - override /trainer: default.yaml

tags: {tags}

seed: 42

callbacks:
  model_checkpoint:
    monitor: "val/loss"
    save_top_k: 30
  early_stopping:
    monitor: "val/loss"
"""

EXPERIMENTS = {
    # name: (task, datamodule, tags, trainer block, extra blocks)
    "gcpnet_nms_small": (
        "nms", "nms", '["gcpnet", "nms_small"]',
        dict(min_epochs=100, max_epochs=12000, devices=1),
        {"datamodule": {"batch_size": 100, "data_mode": "small"}},
    ),
    "gcpnet_nms_small_20body": (
        "nms", "nms", '["gcpnet", "nms_small_20body"]',
        dict(min_epochs=100, max_epochs=12000, devices=1),
        {"datamodule": {"batch_size": 100, "data_mode": "small_20body"}},
    ),
    "gcpnet_nms_static": (
        "nms", "nms", '["gcpnet", "nms_static"]',
        dict(min_epochs=100, max_epochs=12000, devices=1),
        {"datamodule": {"batch_size": 100, "data_mode": "static"}},
    ),
    "gcpnet_nms_dynamic": (
        "nms", "nms", '["gcpnet", "nms_dynamic"]',
        dict(min_epochs=100, max_epochs=12000, devices=1),
        {"datamodule": {"batch_size": 100, "data_mode": "dynamic"}},
    ),
    "gcpnet_lba": (
        "lba", "atom3d_lba", '["gcpnet", "lba"]',
        dict(min_epochs=1, max_epochs=1000, devices=1),
        {"datamodule": {"batch_size": 16}},
    ),
    "gcpnet_psr": (
        "psr", "atom3d_psr", '["gcpnet", "psr"]',
        dict(min_epochs=1, max_epochs=1000, devices=1),
        {"datamodule": {"batch_size": 16}},
    ),
    "gcpnet_cpd": (
        "cpd", "cath_cpd", '["gcpnet", "cpd"]',
        dict(min_epochs=1, max_epochs=1000, devices=1,
             accumulate_grad_batches=4),
        {"datamodule": {"batch_size": 8},
         "model": {"dropout": 0.2, "autoregressive_decoder": True}},
    ),
    "gcpnet_rs": (
        "rs", "rs", '["gcpnet", "rs"]',
        dict(min_epochs=1, max_epochs=1000, devices=1),
        {"datamodule": {"batch_size": 64}},
    ),
    "gcpnet_eq": (
        "eq", "eq", '["gcpnet", "eq"]',
        dict(min_epochs=1, max_epochs=1000, devices=1),
        {"datamodule": {"batch_size": 1}},
    ),
    "gcpnet_ar": (
        "ar", "ar", '["gcpnet", "ar"]',
        dict(min_epochs=1, max_epochs=1000, devices=1),
        {"datamodule": {"batch_size": 1}},
    ),
}


def render_block(name, d, indent=0):
    pad = "  " * indent
    lines = [f"{pad}{name}:"]
    for k, v in d.items():
        if isinstance(v, dict):
            lines.extend(render_block(k, v, indent + 1))
        elif isinstance(v, bool):
            lines.append(f"{pad}  {k}: {str(v).lower()}")
        else:
            lines.append(f"{pad}  {k}: {v}")
    return lines


def main():
    os.makedirs(ROOT, exist_ok=True)
    for name, (task, dm, tags, trainer, extra) in EXPERIMENTS.items():
        text = HEADER.format(name=name, dm=dm, task=task, tags=tags)
        text += "\n" + "\n".join(render_block("trainer", trainer)) + "\n"
        for block, vals in extra.items():
            text += "\n" + "\n".join(render_block(block, vals)) + "\n"
        with open(os.path.join(ROOT, name + ".yaml"), "w") as f:
            f.write(text)
        print("wrote experiment/" + name + ".yaml")

        # ablation variant: disables frame updates and the scalar/vector
        # information channels one at a time via CLI-style matrix runs
        abl = text + (
            "\n# ablation toggles (flip via CLI, e.g. "
            "model.module_cfg.ablate_frame_updates=true)\n"
            "model:\n"
            "  module_cfg:\n"
            "    ablate_frame_updates: false\n"
            "    ablate_scalars: false\n"
            "    ablate_vectors: false\n"
        )
        with open(os.path.join(ROOT, name + "_ablations.yaml"), "w") as f:
            f.write(abl)
        print("wrote experiment/" + name + "_ablations.yaml")


if __name__ == "__main__":
    main()
