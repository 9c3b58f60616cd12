#!/usr/bin/env python
"""Generate a grid-search run manifest (JSON) for a task.

The analog of the reference's scripts/generate_<task>_grid_search_runs.py
(itertools product over a search space -> JSON records, one per run), with
one parameterized generator instead of per-task copies.

    python scripts/generate_grid_search_runs.py --task lba \\
        --output grid_search/lba_runs.json
"""

import argparse
import itertools
import json
import os

SEARCH_SPACES = {
    # mirrors the reference's per-task grid axes (model/layer hyperparams)
    "lba": {
        "model.optimizer.lr": [1e-4, 3e-4],
        "model.model_cfg.h_hidden_dim": [100, 128],
        "model.model_cfg.num_encoder_layers": [6, 8],
        "model.layer_cfg.num_feedforward_layers": [1, 2],
        "model.module_cfg.bottleneck": [4],
    },
    "psr": {
        "model.optimizer.lr": [1e-4, 3e-4],
        "model.model_cfg.num_encoder_layers": [4, 5, 6],
        "model.layer_cfg.num_feedforward_layers": [1, 2],
    },
    "cpd": {
        "model.optimizer.lr": [1e-4],
        "model.model_cfg.num_encoder_layers": [8, 9],
        "model.model_cfg.dropout": [0.1, 0.2],
        "trainer.accumulate_grad_batches": [1, 4],
    },
    "nms": {
        "model.optimizer.lr": [1e-4, 5e-4],
        "model.model_cfg.h_hidden_dim": [64, 96],
        "model.model_cfg.num_encoder_layers": [4],
        "datamodule.batch_size": [100],
    },
    "rs": {
        "model.optimizer.lr": [1e-4, 3e-4],
        "model.model_cfg.num_encoder_layers": [6, 8],
        "model.module_cfg.enable_e3_equivariance": [False, True],
    },
    "eq": {
        "model.optimizer.lr": [1e-4, 3e-4],
        "model.model_cfg.num_encoder_layers": [4, 5],
        "model.layer_cfg.mp_cfg.num_message_layers": [4, 8],
    },
    "ar": {
        "model.optimizer.lr": [1e-4, 3e-4],
        "model.model_cfg.num_encoder_layers": [3, 4],
        "model.layer_cfg.mp_cfg.num_message_layers": [4],
    },
}

EXPERIMENT_OF_TASK = {
    "lba": "gcpnet_lba", "psr": "gcpnet_psr", "cpd": "gcpnet_cpd",
    "nms": "gcpnet_nms_small", "rs": "gcpnet_rs", "eq": "gcpnet_eq",
    "ar": "gcpnet_ar",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", required=True, choices=sorted(SEARCH_SPACES))
    ap.add_argument("--output", default=None)
    args = ap.parse_args()

    space = SEARCH_SPACES[args.task]
    keys = sorted(space)
    runs = []
    for i, combo in enumerate(itertools.product(*(space[k] for k in keys))):
        overrides = {k: v for k, v in zip(keys, combo)}
        runs.append(
            {
                "run_id": f"{args.task}_gs_{i:04d}",
                "experiment": EXPERIMENT_OF_TASK[args.task],
                "overrides": overrides,
            }
        )

    out = args.output or f"grid_search/{args.task}_runs.json"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(runs, f, indent=2)
    print(f"wrote {len(runs)} runs to {out}")


if __name__ == "__main__":
    main()
