"""AMBER violation metrics on the reference's real example structures
(/root/reference/data/AR/examples), plus synthetic violation probes.
The OpenMM minimization loop itself is exercised only when OpenMM is
installed (reference amber_minimize.py:923-1002 protocol)."""

import copy
import os

import numpy as np
import pytest

from gcpnet_tpu.data.pdb import parse_pdb
from gcpnet_tpu.utils.amber.violations import (
    between_residue_bond_violations,
    extreme_ca_ca_fraction,
    find_violations,
)

REF_DECOY = "/root/reference/data/AR/examples/decoy_model/2CZOA.pdb"
REF_TRUE = "/root/reference/data/AR/examples/true_model/2CZOA.pdb"

needs_ref = pytest.mark.skipif(
    not os.path.exists(REF_DECOY), reason="reference example data not present"
)


@needs_ref
def test_violation_metrics_on_real_decoy():
    s = parse_pdb(REF_DECOY, heavy_only=True)
    v = find_violations(s)
    for key in (
        "violations_extreme_ca_ca_distance",
        "violations_between_residue_bond",
        "violations_between_residue_clash",
        "violations_per_residue",
        "num_residue_violations",
    ):
        assert np.isfinite(v[key]), key
        assert 0.0 <= float(v[key]) or key == "num_residue_violations"
    assert len(v["per_residue_violation_mask"]) == int(s.residue_index().max()) + 1
    assert v["num_residue_violations"] == len(v["residue_violations"])


@needs_ref
def test_corrupted_structure_has_more_clashes():
    s = parse_pdb(REF_DECOY, heavy_only=True)
    base = find_violations(s)

    # squash the second half of the chain onto the first: massive clashes
    bad = copy.deepcopy(s)
    coords = bad.coords
    half = len(bad.atoms) // 2
    for i in range(half, len(bad.atoms)):
        src = bad.atoms[i - half]
        bad.atoms[i].x = src.x + 0.3
        bad.atoms[i].y = src.y
        bad.atoms[i].z = src.z
    corrupted = find_violations(bad)
    assert (
        corrupted["violations_between_residue_clash"]
        > base["violations_between_residue_clash"]
    )


@needs_ref
def test_stretched_peptide_bond_detected():
    s = parse_pdb(REF_DECOY, heavy_only=True)
    base = between_residue_bond_violations(s)["per_residue_violation_mask"]

    bad = copy.deepcopy(s)
    # translate every atom of the last half of residues by 10 A: breaks the
    # peptide bond at the split point
    res_idx = bad.residue_index()
    split = int(res_idx.max()) // 2
    for i, a in enumerate(bad.atoms):
        if res_idx[i] > split:
            a.x += 10.0
    stretched = between_residue_bond_violations(bad)["per_residue_violation_mask"]
    assert stretched.sum() > base.sum()
    assert stretched[split] or stretched[split + 1]
    assert extreme_ca_ca_fraction(bad) > extreme_ca_ca_fraction(s)


@needs_ref
def test_relax_pipeline_requires_openmm():
    pytest.importorskip("openmm")
    from gcpnet_tpu.utils.amber.relax import AmberRelaxation

    relaxer = AmberRelaxation(max_outer_iterations=2)
    out = "/tmp/2CZOA_relaxed.pdb"
    assert relaxer.relax_pdb(REF_DECOY, out)
    assert os.path.exists(out)


def _mk_atom(serial, name, resname, chain, resseq, x, y, z, element):
    from gcpnet_tpu.data.pdb import AtomRecord

    return AtomRecord(
        serial=serial, name=name, altloc="", resname=resname, chain=chain,
        resseq=resseq, icode="", x=x, y=y, z=z, occupancy=1.0, bfactor=0.0,
        element=element,
    )


def test_peptide_clash_exemption_is_directed_and_chain_scoped():
    """Only the bonded C(i)-N(i+1) pair (same chain) is exempt from the
    clash check; C(i) against N(i-1) or a cross-chain C/N contact at
    adjacent residue numbers counts as a clash (AlphaFold amber_minimize
    semantics; ADVICE r2)."""
    from gcpnet_tpu.data.pdb import Structure
    from gcpnet_tpu.utils.amber.violations import between_residue_clashes

    D = 1.3  # < C+N vdW overlap threshold (1.7 + 1.55 - 1.5 = 1.75)

    # bonded C(1) -> N(2), same chain: exempt
    s = Structure(atoms=[
        _mk_atom(1, "C", "ALA", "A", 1, 0.0, 0.0, 0.0, "C"),
        _mk_atom(2, "N", "ALA", "A", 2, D, 0.0, 0.0, "N"),
    ])
    assert not between_residue_clashes(s)["per_atom_clash_mask"].any()

    # reversed direction: N(1) close to C(2) is NOT the peptide bond
    s = Structure(atoms=[
        _mk_atom(1, "N", "ALA", "A", 1, 0.0, 0.0, 0.0, "N"),
        _mk_atom(2, "C", "ALA", "A", 2, D, 0.0, 0.0, "C"),
    ])
    assert between_residue_clashes(s)["per_atom_clash_mask"].all()

    # cross-chain C/N at adjacent resseq: NOT exempt
    s = Structure(atoms=[
        _mk_atom(1, "C", "ALA", "A", 1, 0.0, 0.0, 0.0, "C"),
        _mk_atom(2, "N", "ALA", "B", 2, D, 0.0, 0.0, "N"),
    ])
    assert between_residue_clashes(s)["per_atom_clash_mask"].all()

    # non-consecutive resseq on the same chain: NOT exempt
    s = Structure(atoms=[
        _mk_atom(1, "C", "ALA", "A", 1, 0.0, 0.0, 0.0, "C"),
        _mk_atom(2, "N", "ALA", "A", 3, D, 0.0, 0.0, "N"),
    ])
    assert between_residue_clashes(s)["per_atom_clash_mask"].all()
