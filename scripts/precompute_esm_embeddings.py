#!/usr/bin/env python
"""Precompute ESM-2 650M residue embeddings for EQ/AR PDB directories.

Run once on a machine with fair-esm installed; the cache keys embeddings by
sha1(sequence), which gcpnet_tpu.data.esm.embed_sequence reads back.

    python scripts/precompute_esm_embeddings.py \\
        --pdb-dirs data/EQ/decoy_model data/AR/AF2_model \\
        --cache-dir data/esm_cache
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pdb-dirs", nargs="+", required=True)
    ap.add_argument("--cache-dir", required=True)
    args = ap.parse_args()

    from gcpnet_tpu.data.esm import _try_live_esm, _seq_key
    from gcpnet_tpu.data.eq import structure_sequence
    from gcpnet_tpu.data.pdb import parse_pdb

    import numpy as np

    os.makedirs(args.cache_dir, exist_ok=True)
    done = skipped = 0
    for d in args.pdb_dirs:
        for fname in sorted(os.listdir(d)):
            if not fname.endswith(".pdb"):
                continue
            seq = structure_sequence(
                parse_pdb(os.path.join(d, fname), heavy_only=True)
            )
            out = os.path.join(args.cache_dir, _seq_key(seq) + ".npy")
            if os.path.exists(out):
                skipped += 1
                continue
            emb = _try_live_esm(seq)
            if emb is None:
                raise RuntimeError(
                    "fair-esm is required for precomputation "
                    "(pip install fair-esm)"
                )
            np.save(out, emb)
            done += 1
    print(f"embedded {done} sequences ({skipped} cached)")


if __name__ == "__main__":
    main()
