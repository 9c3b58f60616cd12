"""Native PDB cleanup protocol on malformed fixtures: nonstandard-residue
replacement, heterogen removal, Se->S, single-residue-chain removal,
missing-atom detection and backbone-O reconstruction
(reference src/utils/amber/cleanup.py:26-126 protocol)."""

import numpy as np

from gcpnet_tpu.data.pdb import AtomRecord, Structure
from gcpnet_tpu.utils.amber.cleanup import (
    clean_pdb,
    clean_structure,
    find_missing_heavy_atoms,
    rebuild_backbone_oxygens,
)


def _atom(name, resname, chain, resseq, xyz, element=None, serial=1):
    return AtomRecord(
        serial=serial, name=name, altloc="", resname=resname, chain=chain,
        resseq=resseq, icode="", x=xyz[0], y=xyz[1], z=xyz[2],
        occupancy=1.0, bfactor=0.0,
        element=element or name[0],
    )


def _gly(chain, resseq, offset):
    # ideal-ish backbone: N, CA, C (no O)
    return [
        _atom("N", "GLY", chain, resseq, (offset, 0.0, 0.0), "N"),
        _atom("CA", "GLY", chain, resseq, (offset + 1.46, 0.0, 0.0), "C"),
        _atom("C", "GLY", chain, resseq, (offset + 2.0, 1.4, 0.0), "C"),
        _atom("O", "GLY", chain, resseq, (offset + 1.6, 2.5, 0.2), "O"),
    ]


def test_clean_structure_protocol():
    atoms = []
    # MSE with a selenium SE atom -> MET with SD sulfur
    atoms.append(_atom("SE", "MSE", "A", 1, (0, 0, 0), "SE"))
    atoms.append(_atom("CA", "MSE", "A", 1, (1, 0, 0), "C"))
    atoms += _gly("A", 2, 4.0)
    # water + ligand heterogens must go
    atoms.append(_atom("O", "HOH", "A", 90, (9, 9, 9), "O"))
    atoms.append(_atom("C1", "LIG", "A", 91, (8, 8, 8), "C"))
    # chain B has a single residue -> removed entirely
    atoms += [_atom("CA", "ALA", "B", 1, (20, 0, 0), "C")]
    info = {}
    s = clean_structure(Structure(atoms=atoms), info)

    resnames = {a.resname for a in s.atoms}
    assert "MSE" not in resnames and "MET" in resnames
    assert not any(a.resname in ("HOH", "LIG") for a in s.atoms)
    assert not any(a.chain == "B" for a in s.atoms)
    sd = [a for a in s.atoms if a.name == "SD"]
    assert sd and sd[0].element.upper() in ("S", "SD"[0])
    assert ("A", 1, "MSE") in info["nonstandard_residues"]
    assert "HOH" in info["removed_heterogens"]
    assert info["removed_chains"][0] == ["B"]


def test_missing_atom_detection_and_backbone_o_rebuild():
    res1 = [
        _atom("N", "ALA", "A", 1, (0.0, 0.0, 0.0), "N"),
        _atom("CA", "ALA", "A", 1, (1.46, 0.0, 0.0), "C"),
        _atom("C", "ALA", "A", 1, (2.0, 1.4, 0.0), "C"),
        # O missing; CB missing
    ]
    res2 = [
        _atom("N", "GLY", "A", 2, (3.3, 1.5, 0.3), "N"),
        _atom("CA", "GLY", "A", 2, (4.6, 2.1, 0.3), "C"),
        _atom("C", "GLY", "A", 2, (5.6, 1.2, 1.0), "C"),
        _atom("O", "GLY", "A", 2, (5.5, 0.0, 1.0), "O"),
    ]
    s = Structure(atoms=res1 + res2)
    missing = find_missing_heavy_atoms(s)
    assert missing[("A", 1, "")] == ["O", "CB"]

    rebuilt, added = rebuild_backbone_oxygens(s)
    assert added == [("A", 1)]
    names1 = [a.name for a in rebuilt.atoms if a.resseq == 1]
    assert "O" in names1
    o = next(a for a in rebuilt.atoms if a.resseq == 1 and a.name == "O")
    c = next(a for a in rebuilt.atoms if a.resseq == 1 and a.name == "C")
    d = np.linalg.norm(np.array([o.x - c.x, o.y - c.y, o.z - c.z]))
    assert abs(d - 1.229) < 1e-3
    # now only CB is missing
    assert find_missing_heavy_atoms(rebuilt)[("A", 1, "")] == ["CB"]
    # serials renumbered consecutively
    assert [a.serial for a in rebuilt.atoms] == list(
        range(1, len(rebuilt.atoms) + 1)
    )


def test_clean_pdb_end_to_end(tmp_path):
    atoms = []
    atoms.append(_atom("SE", "MSE", "A", 1, (0, 0, 0), "SE"))
    atoms.append(_atom("CA", "MSE", "A", 1, (1.4, 0, 0), "C"))
    atoms += _gly("A", 2, 4.0)
    atoms.append(_atom("O", "HOH", "A", 50, (9, 9, 9), "O"))
    from gcpnet_tpu.data.pdb import write_structure

    src = tmp_path / "malformed.pdb"
    dst = tmp_path / "clean.pdb"
    write_structure(str(src), Structure(atoms=atoms))
    info = {}
    out = clean_pdb(str(src), str(dst), info)
    from gcpnet_tpu.data.pdb import parse_pdb

    cleaned = parse_pdb(out, heavy_only=True)
    assert {a.resname for a in cleaned.atoms} <= {"MET", "GLY"}
    assert "missing_heavy_atoms" in info
