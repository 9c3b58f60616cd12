"""Structural-violation metrics (numpy, no force-field dependency).

The reference vendors AlphaFold's violation machinery inside its AMBER
subsystem (/root/reference/src/utils/amber/amber_minimize.py:323-862).
This module re-implements the same published protocol (Jumper et al. 2021
Suppl. 1.9.11, eq. 44-46) directly from a parsed PDB structure:

* between-residue peptide-bond length + angle violations at 12 sigma of
  the PDB distributions (with the proline C-N special case),
* extreme CA-CA distance violations (> 1.5 A beyond the 3.8 A ideal),
* between-residue steric clashes by van-der-Waals overlap (1.5 A
  tolerance), exempting the bonded peptide C-N pair and disulfide SG-SG,
* per-residue violation masks driving the iterative restrained-relax loop
  (residues participating in any violation are excluded from restraints on
  the next iteration, amber_minimize.py:923-1002).

All constants are the published PDB statistics the reference also uses
(residue_constants.py:29,377-397).
"""

from __future__ import annotations

from typing import Dict, List, Set, Tuple

import numpy as np

from gcpnet_tpu.data.pdb import Structure

# PDB-statistics constants (Jumper et al. 2021; reference
# residue_constants.py:29,392-397)
CA_CA = 3.80209737096
C_N_LENGTH = (1.329, 1.341)  # (general, pre-proline)
C_N_STDDEV = (0.014, 0.016)
COS_CA_C_N = (-0.5203, 0.0353)
COS_C_N_CA = (-0.4473, 0.0311)
TOLERANCE_FACTOR = 12.0
CA_CA_TOLERANCE = 1.5

VDW_RADII = {"C": 1.7, "N": 1.55, "O": 1.52, "S": 1.8, "P": 1.8, "H": 1.2}
CLASH_OVERLAP_TOL = 1.5


def _backbone_table(s: Structure):
    """Per-residue indices of N/CA/C atoms plus residue names and gap info."""
    res_idx = s.residue_index()
    num_res = int(res_idx.max()) + 1 if len(s.atoms) else 0
    table = {name: np.full(num_res, -1, dtype=np.int64) for name in ("N", "CA", "C")}
    resnames = [""] * num_res
    resseqs = np.zeros(num_res, dtype=np.int64)
    chains = [""] * num_res
    for i, atom in enumerate(s.atoms):
        r = int(res_idx[i])
        resnames[r] = atom.resname
        resseqs[r] = atom.resseq
        chains[r] = atom.chain
        if atom.name in table and table[atom.name][r] < 0:
            table[atom.name][r] = i
    return res_idx, num_res, table, resnames, resseqs, chains


def _consecutive_mask(resseqs, chains) -> np.ndarray:
    """True where residue i+1 directly follows residue i on the same chain."""
    if len(resseqs) < 2:
        return np.zeros(0, dtype=bool)
    same_chain = np.asarray(
        [chains[i] == chains[i + 1] for i in range(len(chains) - 1)]
    )
    return same_chain & (np.diff(resseqs) == 1)


def between_residue_bond_violations(s: Structure) -> Dict[str, np.ndarray]:
    """Peptide-bond length + angle hard violations at 12 sigma (eq. 44-45)."""
    coords = s.coords.astype(np.float64)
    _, num_res, bb, resnames, resseqs, chains = _backbone_table(s)
    per_res = np.zeros(num_res, dtype=bool)
    if num_res < 2:
        return {"per_residue_violation_mask": per_res}

    consec = _consecutive_mask(resseqs, chains)
    this_ca, this_c = bb["CA"][:-1], bb["C"][:-1]
    next_n, next_ca = bb["N"][1:], bb["CA"][1:]
    have = (this_c >= 0) & (next_n >= 0) & consec

    pair_viol = np.zeros(num_res - 1, dtype=bool)
    idx = np.where(have)[0]
    if idx.size:
        c_pos = coords[this_c[idx]]
        n_pos = coords[next_n[idx]]
        d_cn = np.linalg.norm(c_pos - n_pos, axis=-1)
        next_is_pro = np.asarray(
            [resnames[i + 1] == "PRO" for i in idx], dtype=bool
        )
        gt = np.where(next_is_pro, C_N_LENGTH[1], C_N_LENGTH[0])
        sd = np.where(next_is_pro, C_N_STDDEV[1], C_N_STDDEV[0])
        pair_viol[idx] |= np.abs(d_cn - gt) > TOLERANCE_FACTOR * sd

        # CA-C-N angle (around C)
        ok = this_ca[idx] >= 0
        if ok.any():
            sub = idx[ok]
            ca_pos = coords[bb["CA"][sub]]
            c_pos2 = coords[bb["C"][sub]]
            n_pos2 = coords[bb["N"][sub + 1]]
            v1 = ca_pos - c_pos2
            v2 = n_pos2 - c_pos2
            cos = np.sum(v1 * v2, axis=-1) / (
                np.linalg.norm(v1, axis=-1) * np.linalg.norm(v2, axis=-1) + 1e-9
            )
            pair_viol[sub] |= (
                np.abs(cos - COS_CA_C_N[0]) > TOLERANCE_FACTOR * COS_CA_C_N[1]
            )
        # C-N-CA angle (around N)
        ok = next_ca[idx] >= 0
        if ok.any():
            sub = idx[ok]
            c_pos2 = coords[bb["C"][sub]]
            n_pos2 = coords[bb["N"][sub + 1]]
            ca_pos2 = coords[bb["CA"][sub + 1]]
            v1 = c_pos2 - n_pos2
            v2 = ca_pos2 - n_pos2
            cos = np.sum(v1 * v2, axis=-1) / (
                np.linalg.norm(v1, axis=-1) * np.linalg.norm(v2, axis=-1) + 1e-9
            )
            pair_viol[sub] |= (
                np.abs(cos - COS_C_N_CA[0]) > TOLERANCE_FACTOR * COS_C_N_CA[1]
            )

    # a pair violation marks both participating residues
    per_res[:-1] |= pair_viol
    per_res[1:] |= pair_viol
    return {"per_residue_violation_mask": per_res}


def extreme_ca_ca_fraction(s: Structure) -> float:
    """Fraction of consecutive CA-CA pairs > 1.5 A beyond the 3.8 A ideal."""
    coords = s.coords.astype(np.float64)
    _, num_res, bb, _, resseqs, chains = _backbone_table(s)
    if num_res < 2:
        return 0.0
    consec = _consecutive_mask(resseqs, chains)
    have = (bb["CA"][:-1] >= 0) & (bb["CA"][1:] >= 0) & consec
    if not have.any():
        return 0.0
    d = np.linalg.norm(
        coords[bb["CA"][:-1][have]] - coords[bb["CA"][1:][have]], axis=-1
    )
    return float(np.mean((d - CA_CA) > CA_CA_TOLERANCE))


def between_residue_clashes(s: Structure) -> Dict[str, np.ndarray]:
    """Van-der-Waals overlap clashes between atoms of different residues.

    Bonded inter-residue pairs are exempt: the peptide C(i)-N(i+1) bond and
    cysteine SG-SG disulfides (amber_minimize.py:458-564 semantics).
    """
    coords = s.coords.astype(np.float64)
    res_idx = s.residue_index()
    n_atoms = len(s.atoms)
    clash_atom = np.zeros(n_atoms, dtype=bool)
    if n_atoms < 2:
        return {"per_atom_clash_mask": clash_atom}

    radii = np.asarray([VDW_RADII.get(e, 1.7) for e in s.elements])
    diff = coords[:, None] - coords[None, :]
    dist = np.sqrt(np.sum(diff * diff, axis=-1) + 1e-12)
    lower_bound = radii[:, None] + radii[None, :] - CLASH_OVERLAP_TOL

    different_res = res_idx[:, None] != res_idx[None, :]

    # exempt ONLY the bonded peptide pair C(i)-N(i+1): directed, sequence-
    # consecutive, same chain (amber_minimize semantics) — C(i) vs N(i-1)
    # or any cross-chain C/N contact at adjacent dense indices is a real
    # clash and must be counted
    names = [a.name for a in s.atoms]
    is_c = np.asarray([n == "C" for n in names])
    is_n = np.asarray([n == "N" for n in names])
    resseq = np.asarray([a.resseq for a in s.atoms], dtype=np.int64)
    chain_ids = {c: k for k, c in enumerate({a.chain for a in s.atoms})}
    chain = np.asarray([chain_ids[a.chain] for a in s.atoms], dtype=np.int64)
    same_chain = chain[:, None] == chain[None, :]
    next_res = resseq[None, :] == resseq[:, None] + 1
    bonded_cn = is_c[:, None] & is_n[None, :] & next_res & same_chain
    peptide = bonded_cn | bonded_cn.T
    # exempt disulfides: SG-SG between cysteines
    is_sg = np.asarray(
        [a.name == "SG" and a.resname == "CYS" for a in s.atoms]
    )
    disulfide = is_sg[:, None] & is_sg[None, :]

    clash = (dist < lower_bound) & different_res & ~peptide & ~disulfide
    np.fill_diagonal(clash, False)
    clash_atom = clash.any(axis=1)
    return {"per_atom_clash_mask": clash_atom}


def find_violations(s: Structure) -> Dict[str, object]:
    """All violation families + the per-residue mask driving relax exclusions
    (reference get_violation_metrics/find_violations,
    amber_minimize.py:785-862)."""
    res_idx = s.residue_index()
    num_res = int(res_idx.max()) + 1 if len(s.atoms) else 0

    bond = between_residue_bond_violations(s)
    clash = between_residue_clashes(s)

    res_clash = np.zeros(num_res, dtype=bool)
    for i, r in enumerate(res_idx):
        if clash["per_atom_clash_mask"][i]:
            res_clash[int(r)] = True

    total_mask = bond["per_residue_violation_mask"] | res_clash
    residue_violations: List[int] = [int(i) for i in np.where(total_mask)[0]]

    return {
        "violations_extreme_ca_ca_distance": extreme_ca_ca_fraction(s),
        "violations_between_residue_bond": (
            float(bond["per_residue_violation_mask"].mean()) if num_res else 0.0
        ),
        "violations_between_residue_clash": (
            float(res_clash.mean()) if num_res else 0.0
        ),
        "violations_per_residue": (
            float(total_mask.mean()) if num_res else 0.0
        ),
        "num_residue_violations": float(total_mask.sum()),
        "residue_violations": residue_violations,
        "per_residue_violation_mask": total_mask,
        "per_atom_clash_mask": clash["per_atom_clash_mask"],
    }


def structural_violations(s: Structure) -> Dict[str, float]:
    """Summary metrics (scalar-only view of :func:`find_violations`)."""
    v = find_violations(s)
    return {
        k: float(val)
        for k, val in v.items()
        if isinstance(val, (int, float, np.floating))
    }
