"""Structural-violation metrics (numpy, no force-field dependency).

The reference vendors AlphaFold's violation metrics inside its AMBER
subsystem (/root/reference/src/utils/amber/amber_minimize.py:648-862,
OpenMM-based).  This native version reports the same families of
violations from ideal backbone geometry: bond-length deviations, Ca-chain
breaks, and inter-residue steric clashes by van der Waals overlap.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from gcpnet_tpu.data.pdb import Structure

# ideal backbone bond lengths (Å) and tolerance factor
IDEAL_BONDS = {
    ("N", "CA"): 1.459,
    ("CA", "C"): 1.525,
    ("C", "O"): 1.229,
}
PEPTIDE_BOND = 1.336  # C(i) - N(i+1)
BOND_TOL = 12.0  # standard deviations (AlphaFold uses 12 sigma)
BOND_SIGMA = 0.02

VDW_RADII = {"C": 1.7, "N": 1.55, "O": 1.52, "S": 1.8, "P": 1.8, "H": 1.2}
CLASH_OVERLAP_TOL = 1.5


def structural_violations(s: Structure) -> Dict[str, float]:
    coords = s.coords
    res_idx = s.residue_index()
    names = [a.name for a in s.atoms]
    elements = s.elements
    num_res = int(res_idx.max()) + 1 if len(s.atoms) else 0

    # within-residue backbone bonds
    by_res: Dict[int, Dict[str, int]] = {}
    for i, (r, n) in enumerate(zip(res_idx, names)):
        by_res.setdefault(int(r), {})[n] = i

    bond_viol = 0
    bond_total = 0
    for r, atoms in by_res.items():
        for (a, b), ideal in IDEAL_BONDS.items():
            if a in atoms and b in atoms:
                d = np.linalg.norm(coords[atoms[a]] - coords[atoms[b]])
                bond_total += 1
                if abs(d - ideal) > BOND_TOL * BOND_SIGMA:
                    bond_viol += 1
        # peptide bond to the next residue
        nxt = by_res.get(r + 1)
        if nxt and "C" in atoms and "N" in nxt:
            d = np.linalg.norm(coords[atoms["C"]] - coords[nxt["N"]])
            bond_total += 1
            if abs(d - PEPTIDE_BOND) > BOND_TOL * BOND_SIGMA:
                bond_viol += 1

    # inter-residue clashes (vdW overlap beyond tolerance), excluding
    # adjacent residues
    radii = np.asarray([VDW_RADII.get(e, 1.7) for e in elements])
    clash_atoms = np.zeros(len(s.atoms), dtype=bool)
    if len(s.atoms) > 1:
        d = np.linalg.norm(coords[:, None] - coords[None, :], axis=-1)
        sep = np.abs(res_idx[:, None] - res_idx[None, :])
        lim = radii[:, None] + radii[None, :] - CLASH_OVERLAP_TOL
        clash = (d < lim) & (sep > 1)
        np.fill_diagonal(clash, False)
        clash_atoms = clash.any(axis=1)

    residues_with_clash = np.zeros(num_res, dtype=bool)
    for i, r in enumerate(res_idx):
        if clash_atoms[i]:
            residues_with_clash[int(r)] = True

    return {
        "bond_violation_fraction": bond_viol / max(bond_total, 1),
        "num_bond_violations": float(bond_viol),
        "clash_atom_fraction": float(clash_atoms.mean()) if len(s.atoms) else 0.0,
        "residues_with_clash_fraction": (
            float(residues_with_clash.mean()) if num_res else 0.0
        ),
    }
