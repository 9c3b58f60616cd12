#!/usr/bin/env python
"""Convert ATOM3D LMDB splits to the npz record directories the datamodule
reads in environments without lmdb/atom3d.

Run once on a machine with the atom3d package installed:

    python scripts/convert_atom3d_to_npz.py --task LBA \\
        --data-dir data/ATOM3D --lba-split 30
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def convert_split(task, split_dir, out_dir):
    from atom3d.datasets import LMDBDataset  # requires atom3d

    os.makedirs(out_dir, exist_ok=True)
    ds = LMDBDataset(split_dir)
    for i in range(len(ds)):
        elem = ds[i]
        if task == "LBA":
            import pandas as pd

            pocket, ligand = elem["atoms_pocket"], elem["atoms_ligand"]
            df = pd.concat([pocket, ligand], ignore_index=True)
            lig_flag = np.zeros(df.shape[0], dtype=np.int32)
            lig_flag[-len(ligand):] = 1
            np.savez_compressed(
                os.path.join(out_dir, f"{i:06d}.npz"),
                coords=df[["x", "y", "z"]].to_numpy(np.float32),
                elements=np.asarray(df["element"].tolist()),
                lig_flag=lig_flag,
                label=np.float32(elem["scores"]["neglog_aff"]),
            )
        else:  # PSR
            df = elem["atoms"]
            df = df[df.element != "H"].reset_index(drop=True)
            np.savez_compressed(
                os.path.join(out_dir, f"{i:06d}.npz"),
                coords=df[["x", "y", "z"]].to_numpy(np.float32),
                elements=np.asarray(df["element"].tolist()),
                label=np.float32(elem["scores"]["gdt_ts"]),
                target=str(eval(elem["id"])[0]) if "id" in elem else "",
            )
    print(f"wrote {len(ds)} records to {out_dir}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", choices=["LBA", "PSR"], required=True)
    ap.add_argument("--data-dir", default="data/ATOM3D")
    ap.add_argument("--lba-split", type=int, default=30)
    args = ap.parse_args()

    sub = (
        f"LBA/split-by-sequence-identity-{args.lba_split}/data"
        if args.task == "LBA"
        else "PSR/split-by-year/data"
    )
    for split in ("train", "val", "test"):
        split_dir = os.path.join(args.data_dir, sub, split)
        convert_split(args.task, split_dir, split_dir + "_npz")


if __name__ == "__main__":
    main()
