"""Subprocess wrappers for external scoring binaries.

Mirrors the reference's wrappers (/root/reference/src/models/__init__.py:
269-335, eq_dataset.py:162-183): TM-score, lddt and MolProbity run as
subprocesses when their executables are configured (configs/paths/
default.yaml); otherwise the native numpy implementations in
gcpnet_tpu.utils.structure_metrics are used (TM-score/lDDT/GDT) or the
metric is skipped (MolProbity).
"""

from __future__ import annotations

import os
import re
import subprocess
from typing import Dict, Optional

import numpy as np

from gcpnet_tpu.utils.pylogger import get_pylogger

log = get_pylogger(__name__)


def calculate_tmscore_metrics(
    pred_pdb: str, native_pdb: str, tmscore_exec_path: Optional[str] = None
) -> Dict[str, float]:
    """TM-score binary metrics; falls back to the native implementation."""
    if tmscore_exec_path and os.path.exists(os.path.expanduser(tmscore_exec_path)):
        out = subprocess.run(
            [os.path.expanduser(tmscore_exec_path), pred_pdb, native_pdb],
            capture_output=True, text=True, timeout=300,
        ).stdout
        metrics = {}
        patterns = {
            "TM-score": r"TM-score\s*=\s*([\d.]+)",
            "GDT-TS": r"GDT-TS-score\s*=\s*([\d.]+)",
            "GDT-HA": r"GDT-HA-score\s*=\s*([\d.]+)",
            "MaxSub": r"MaxSub-score\s*=\s*([\d.]+)",
            "RMSD": r"RMSD of\s+the common residues\s*=\s*([\d.]+)",
        }
        for key, pat in patterns.items():
            m = re.search(pat, out)
            if m:
                metrics[key] = float(m.group(1))
        if metrics:
            return metrics
        log.warning("TM-score binary produced no parseable output; "
                    "falling back to native scoring")

    from gcpnet_tpu.data.pdb import parse_pdb
    from gcpnet_tpu.utils.structure_metrics import structure_scores

    pred = parse_pdb(pred_pdb)
    native = parse_pdb(native_pdb)
    pred_ca, native_ca = _matched_ca(pred, native)
    return structure_scores(pred_ca, native_ca)


def _matched_ca(pred, native):
    """Match Ca atoms by (chain, resseq, icode)."""
    pred_map = {
        (a.chain, a.resseq, a.icode): i
        for i, a in enumerate(pred.atoms)
        if a.name == "CA"
    }
    pc, nc = [], []
    for i, a in enumerate(native.atoms):
        if a.name != "CA":
            continue
        key = (a.chain, a.resseq, a.icode)
        if key in pred_map:
            pc.append(pred.coords[pred_map[key]])
            nc.append(native.coords[i])
    return np.asarray(pc), np.asarray(nc)


def generate_lddt_score(
    pred_pdb: str, native_pdb: str, lddt_exec_path: Optional[str] = None,
    per_residue: bool = True,
):
    """Per-residue (or global) lDDT; native fallback when the binary is not
    configured (reference eq_dataset.py:162-183)."""
    if lddt_exec_path and os.path.exists(os.path.expanduser(lddt_exec_path)):
        out = subprocess.run(
            [os.path.expanduser(lddt_exec_path), pred_pdb, native_pdb],
            capture_output=True, text=True, timeout=300,
        ).stdout
        scores = []
        in_table = False
        for line in out.splitlines():
            if line.startswith("Chain"):
                in_table = True
                continue
            if in_table:
                parts = line.split()
                if len(parts) >= 5:
                    try:
                        scores.append(float(parts[4]))
                    except ValueError:
                        scores.append(0.0)
        if scores:
            return np.asarray(scores) if per_residue else float(np.mean(scores))
        log.warning("lddt binary produced no parseable output; using native")

    from gcpnet_tpu.data.pdb import parse_pdb
    from gcpnet_tpu.utils.structure_metrics import lddt as lddt_native

    pred = parse_pdb(pred_pdb, heavy_only=True)
    native = parse_pdb(native_pdb, heavy_only=True)
    # match atoms by (chain, resseq, icode, atom name)
    pred_map = {
        (a.chain, a.resseq, a.icode, a.name): i
        for i, a in enumerate(pred.atoms)
    }
    pc, nc, res = [], [], []
    res_ids = {}
    for i, a in enumerate(native.atoms):
        key = (a.chain, a.resseq, a.icode, a.name)
        if key in pred_map:
            pc.append(pred.coords[pred_map[key]])
            nc.append(native.coords[i])
            rid = (a.chain, a.resseq, a.icode)
            res_ids.setdefault(rid, len(res_ids))
            res.append(res_ids[rid])
    return lddt_native(
        np.asarray(pc), np.asarray(nc),
        residue_index=np.asarray(res), per_residue=per_residue,
    )


def calculate_molprobity_metrics(
    pdb_path: str, molprobity_exec_path: Optional[str] = None
) -> Dict[str, float]:
    """MolProbity one-line analysis (reference src/models/__init__.py:302-335).
    No native fallback — returns {} when the executable is not configured."""
    if not (
        molprobity_exec_path
        and os.path.exists(os.path.expanduser(molprobity_exec_path))
    ):
        return {}
    out = subprocess.run(
        [os.path.expanduser(molprobity_exec_path), os.path.dirname(pdb_path)],
        capture_output=True, text=True, timeout=600,
    ).stdout
    for line in out.splitlines():
        if os.path.basename(pdb_path).split(".")[0] in line:
            parts = line.split(":")
            try:
                return {
                    "clash_score": float(parts[8]),
                    "rotamer_outliers": float(parts[17]),
                    "ramachandran_outliers": float(parts[20]),
                    "molprobity_score": float(parts[45]),
                }
            except (IndexError, ValueError):
                continue
    return {}


def amber_relax(pdb_path: str, output_path: str, **kwargs) -> bool:
    """AMBER relaxation wrapper (reference src/models/__init__.py:239-265).
    Requires OpenMM; returns False (skipped) when unavailable."""
    from gcpnet_tpu.utils.amber.relax import AmberRelaxation

    relaxer = AmberRelaxation(**kwargs)
    try:
        return relaxer.relax_pdb(pdb_path, output_path)
    except ImportError:
        log.warning("OpenMM not available — AMBER relax skipped")
        return False
