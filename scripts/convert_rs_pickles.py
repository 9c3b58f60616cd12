#!/usr/bin/env python
"""Convert the reference's RS pickled dataframes (RDKit mols) into the
rdkit-free ``record`` format consumed by gcpnet_tpu.data.rs.

Run on a machine with rdkit + pandas:
    python scripts/convert_rs_pickles.py train_RS_classification.pkl out.pkl

The output dataframe keeps ID / SMILES_nostereo / RS_label_binary and adds
a ``record`` column (plain dicts from gcpnet_tpu.data.rs.mol_to_record), so
training machines need neither rdkit nor the original mol objects.
"""

import sys


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    src, dst = sys.argv[1], sys.argv[2]
    import pandas as pd

    from gcpnet_tpu.data.rs import mol_to_record

    df = pd.read_pickle(src)
    records = [
        mol_to_record(mol) for mol in df["rdkit_mol_cistrans_stereo"]
    ]
    out = df[["ID", "SMILES_nostereo", "RS_label_binary"]].copy()
    out["record"] = records
    out.to_pickle(dst)
    print(f"wrote {dst}: {len(out)} conformers")


if __name__ == "__main__":
    main()
