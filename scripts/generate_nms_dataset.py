#!/usr/bin/env python
"""Generate NMS trajectory datasets offline.

CLI equivalent of the reference's
src/datamodules/components/nms/generate_dataset.py, backed by the
batch-vectorized simulators (gcpnet_tpu.data.nms_sim):

    python scripts/generate_nms_dataset.py --mode small \\
        --num-train 10000 --num-valid 2000 --num-test 2000 \\
        --out data/NMS
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# Force the host CPU backend via jax.config: the axon sitecustomize makes
# the JAX_PLATFORMS=cpu env var a no-op, and merely touching the default
# backend (even via jax.devices("cpu")) first initializes the remote TPU
# client, which BLOCKS while another process holds the single tunnel chip
# — a dataset generation must never wait on (or touch) the chip.
jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--mode",
        default="small",
        choices=["small", "small_20body", "static", "dynamic", "springs"],
    )
    ap.add_argument("--num-train", type=int, default=10000)
    ap.add_argument("--num-valid", type=int, default=2000)
    ap.add_argument("--num-test", type=int, default=2000)
    ap.add_argument("--length", type=int, default=5000)
    ap.add_argument("--sample-freq", type=int, default=100)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", default="data/NMS")
    args = ap.parse_args()

    from gcpnet_tpu.data.nms_sim import generate_split

    os.makedirs(args.out, exist_ok=True)
    sizes = {
        "train": args.num_train,
        "valid": args.num_valid,
        "test": args.num_test,
    }
    for i, (split, n) in enumerate(sizes.items()):
        t0 = time.time()
        loc, vel, edges, charges = generate_split(
            args.mode, n, seed=args.seed + i,
            T=args.length, sample_freq=args.sample_freq,
        )
        path = os.path.join(args.out, f"nms_{args.mode}_{split}_{n}.npz")
        np.savez_compressed(
            path, loc=loc, vel=vel, edges=edges, charges=charges
        )
        print(f"{split}: {n} sims -> {path} ({time.time() - t0:.1f}s)")


if __name__ == "__main__":
    main()
