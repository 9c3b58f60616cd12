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
