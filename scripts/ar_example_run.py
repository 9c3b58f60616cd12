#!/usr/bin/env python
"""AR pipeline-validation trained run on the reference's shipped example
decoy (/root/reference/data/AR/examples: 2CZOA decoy + true model) — the
AR analog of the round-2 EQ run (VERDICT r2 item 4).

Trains `experiment=gcpnet_ar` on the single example pair, restores the
best checkpoint, refines the decoy, writes the refined PDB, and scores
decoy-vs-native and refined-vs-native with the native structure metrics
(TM-score/GDT-TS/GDT-HA/RMSD/lDDT, gcpnet_tpu.utils.structure_metrics —
the reference shells out to TM-score/lddt binaries here,
src/models/gcpnet_ar_module.py:368-434) plus AlphaFold-protocol violation
counts; logs a W&B molecule table (offline) and prints a JSON summary.

Usage: python scripts/ar_example_run.py [--epochs N] [--out DIR]
"""

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

EXAMPLES = "/root/reference/data/AR/examples"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--out", default="/tmp/ar_example_run")
    ap.add_argument("--accelerator", default="tpu")
    ap.add_argument("--precision", type=int, default=32)
    ap.add_argument(
        "--score-only", action="store_true",
        help="skip training; restore the best checkpoint from a previous "
        "run under --out and run the refinement + scoring stage",
    )
    args = ap.parse_args()

    import numpy as np

    os.makedirs(args.out, exist_ok=True)
    splits = os.path.join(args.out, "splits")
    os.makedirs(splits, exist_ok=True)
    for fname in ("train1.lst", "valid1.lst", "test_ar.lst"):
        with open(os.path.join(splits, fname), "w") as f:
            f.write("2CZOA\n")

    from gcpnet_tpu.config.loader import compose
    import train as train_cli

    overrides = [
        "experiment=gcpnet_ar",
        f"trainer.accelerator={args.accelerator}",
        f"trainer.max_epochs={args.epochs}",
        f"trainer.precision={args.precision}",
        "trainer.min_epochs=0",
        f"datamodule.splits_dir={splits}",
        f"datamodule.af2_dir={EXAMPLES}/decoy_model",
        f"datamodule.true_dir={EXAMPLES}/true_model",
        f"datamodule.model_data_cache_dir={args.out}/cache",
        "callbacks.early_stopping.patience=1000",
        f"paths.output_dir={args.out}/run",
        "logger=wandb.yaml",
    ]
    cfg = compose(os.path.join(ROOT, "configs"), "train.yaml", overrides)
    if args.score_only:
        # rebuild the trainer and restore the best checkpoint of a prior run
        from train import _make_mesh_from_cfg, build_trainer
        from gcpnet_tpu.data.registry import build_datamodule
        from gcpnet_tpu.tasks import build_loss, build_model
        from gcpnet_tpu.train.checkpoints import CheckpointManager

        mesh = _make_mesh_from_cfg(cfg.get("trainer") or {})
        datamodule = build_datamodule(cfg["datamodule"], num_shards=1, seed=42)
        datamodule.prepare_data()
        datamodule.setup()
        model, model_name = build_model(cfg["model"])
        trainer = build_trainer(
            cfg, model, build_loss(model_name), model_name, mesh
        )
        example = next(iter(datamodule.val_batches()))
        trainer.init_state(trainer._put(example))
        mgr = CheckpointManager(
            os.path.join(args.out, "run", "checkpoints"), monitor="val/loss"
        )
        restored = mgr.restore_best(trainer.state) or mgr.restore_last(
            trainer.state
        )
        if restored is None:
            raise FileNotFoundError(f"no checkpoint under {args.out}/run")
        trainer.state = restored
        metrics = {}
    else:
        metrics, trainer = train_cli.train(cfg)
        print(
            "train/test metrics:",
            {k: round(float(v), 5) for k, v in metrics.items()},
        )
        from gcpnet_tpu.data.registry import build_datamodule

        datamodule = build_datamodule(cfg["datamodule"], num_shards=1, seed=42)
        datamodule.prepare_data()
        datamodule.setup()

    # ------------------------------------------------------------------
    # refine the decoy with the best checkpoint and score it
    # ------------------------------------------------------------------
    test_batches = list(datamodule.test_batches())
    assert test_batches, "no AR test batches"
    batch = test_batches[0]

    eval_step = trainer._build_eval_step()
    dev = trainer._put(batch)
    _, preds = eval_step(trainer.state, dev)
    preds = np.asarray(preds)
    mask = np.asarray(batch.valid_node_mask())
    refined = preds[mask]

    from gcpnet_tpu.data.pdb import parse_pdb, write_structure
    from gcpnet_tpu.utils import structure_metrics as SM
    from gcpnet_tpu.utils.amber.violations import find_violations

    decoy = parse_pdb(f"{EXAMPLES}/decoy_model/2CZOA.pdb", heavy_only=True)
    native = parse_pdb(f"{EXAMPLES}/true_model/2CZOA.pdb", heavy_only=True)
    assert refined.shape[0] == len(decoy.atoms), (
        f"atom count mismatch: preds {refined.shape[0]} vs decoy "
        f"{len(decoy.atoms)}"
    )
    refined_path = os.path.join(args.out, "2CZOA_refined.pdb")
    write_structure(refined_path, decoy, coords=refined)
    refined_s = parse_pdb(refined_path, heavy_only=True)

    def ca_coords(s):
        return s.coords[s.ca_indices()].astype(np.float64)

    def score(pred_s, name):
        p, n = ca_coords(pred_s), ca_coords(native)
        assert p.shape == n.shape
        full_p = pred_s.coords.astype(np.float64)
        full_n = native.coords.astype(np.float64)
        viol = find_violations(pred_s)
        out = {
            "tm_score": SM.tm_score(p, n),
            "gdt_ts": SM.gdt_ts(p, n),
            "gdt_ha": SM.gdt_ha(p, n),
            "ca_rmsd": SM.rmsd(p, n),
            "all_atom_lddt": SM.lddt(full_p, full_n)
            if full_p.shape == full_n.shape
            else SM.lddt(p, n),
            "violations_per_residue": viol["violations_per_residue"],
            "num_residue_violations": viol["num_residue_violations"],
        }
        print(name, json.dumps({k: round(float(v), 4) for k, v in out.items()}))
        return out

    decoy_scores = score(decoy, "decoy_vs_native:  ")
    refined_scores = score(refined_s, "refined_vs_native:")

    # W&B molecule table (offline run dir) — reference ar_module.py:331-362
    try:
        from gcpnet_tpu.utils.loggers import WandbLogger

        lg = WandbLogger(offline=True, project="gcpnet-tpu-ar")
        lg.log_molecule_table(
            "ar_refinement",
            [
                {
                    "id": "2CZOA",
                    "annotated_pdb": refined_path,
                    **{f"refined_{k}": v for k, v in refined_scores.items()},
                    **{f"decoy_{k}": v for k, v in decoy_scores.items()},
                }
            ],
        )
        lg.finalize()
    except Exception as exc:  # logger backends are optional
        print(f"wandb table skipped: {exc}")

    summary = {
        "test_loss": float(metrics.get("test/loss", float("nan"))),
        "decoy": decoy_scores,
        "refined": refined_scores,
        "refined_pdb": refined_path,
        "epochs": args.epochs,
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2, default=float)
    print("SUMMARY", json.dumps(summary, default=float))


if __name__ == "__main__":
    main()
