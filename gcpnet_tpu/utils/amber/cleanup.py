"""PDB cleanup before relaxation (the reference vendors AlphaFold's
pdbfixer-based cleanup, /root/reference/src/utils/amber/cleanup.py:26).

Native subset: drop hydrogens/altlocs/heteroatoms, keep the first model,
renumber atoms.  Full missing-atom reconstruction requires pdbfixer and is
applied when that package is importable.
"""

from __future__ import annotations

from gcpnet_tpu.data.pdb import Structure, parse_pdb, write_structure


def clean_pdb(in_path: str, out_path: str) -> str:
    try:
        import pdbfixer  # noqa: F401
        from openmm.app import PDBFile

        fixer = pdbfixer.PDBFixer(filename=in_path)
        fixer.findMissingResidues()
        fixer.findMissingAtoms()
        fixer.addMissingAtoms()
        fixer.removeHeterogens(keepWater=False)
        with open(out_path, "w") as f:
            PDBFile.writeFile(fixer.topology, fixer.positions, f)
        return out_path
    except ImportError:
        pass
    s = parse_pdb(in_path, heavy_only=True, skip_altloc=True)
    write_structure(out_path, Structure(s.atoms))
    return out_path
