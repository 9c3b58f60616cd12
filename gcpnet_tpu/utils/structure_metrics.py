"""Native protein-structure scoring: Kabsch RMSD, lDDT, GDT, TM-score.

The reference shells out to external binaries (TM-score, lddt, MolProbity —
/root/reference/src/models/__init__.py:269-335,
src/datamodules/components/eq_dataset.py:162-183).  Subprocess wrappers are
preserved in gcpnet_tpu.utils.external_tools, but these numpy
implementations make the EQ/AR pipelines self-contained: lDDT follows the
standard definition (Mariani et al. 2013: inclusion radius 15 Å,
thresholds 0.5/1/2/4 Å, inter-residue pairs only); TM-score implements the
Zhang-Skolnick iterative fragment superposition search; GDT-TS/GDT-HA are
computed from the same superposition pool.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

LDDT_THRESHOLDS = (0.5, 1.0, 2.0, 4.0)
GDT_TS_THRESHOLDS = (1.0, 2.0, 4.0, 8.0)
GDT_HA_THRESHOLDS = (0.5, 1.0, 2.0, 4.0)


def kabsch(
    mobile: np.ndarray, target: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Optimal rotation R and translation t minimizing ||mobile@R.T + t -
    target||."""
    mc = mobile.mean(axis=0)
    tc = target.mean(axis=0)
    h = (mobile - mc).T @ (target - tc)
    u, _, vt = np.linalg.svd(h)
    d = np.sign(np.linalg.det(vt.T @ u.T))
    diag = np.diag([1.0, 1.0, d])
    rot = vt.T @ diag @ u.T
    trans = tc - rot @ mc
    return rot, trans


def superimpose(mobile: np.ndarray, target: np.ndarray) -> np.ndarray:
    rot, trans = kabsch(mobile, target)
    return mobile @ rot.T + trans


def rmsd(a: np.ndarray, b: np.ndarray, superimpose_first: bool = True) -> float:
    if superimpose_first:
        a = superimpose(a, b)
    return float(np.sqrt(np.mean(np.sum((a - b) ** 2, axis=-1))))


def lddt(
    pred: np.ndarray,
    native: np.ndarray,
    residue_index: Optional[np.ndarray] = None,
    inclusion_radius: float = 15.0,
    per_residue: bool = False,
):
    """lDDT over matched atom sets (no superposition needed).

    Args:
      pred, native: [N, 3] matched atom coordinates.
      residue_index: [N] residue id per atom; pairs within the same residue
        are excluded.  Defaults to one atom per residue (Ca-lDDT).
    """
    n = pred.shape[0]
    if residue_index is None:
        residue_index = np.arange(n)
    dn = np.linalg.norm(native[:, None, :] - native[None, :, :], axis=-1)
    dp = np.linalg.norm(pred[:, None, :] - pred[None, :, :], axis=-1)
    pair_mask = (
        (dn < inclusion_radius)
        & (residue_index[:, None] != residue_index[None, :])
    )
    np.fill_diagonal(pair_mask, False)

    delta = np.abs(dn - dp)
    preserved = np.zeros_like(delta)
    for t in LDDT_THRESHOLDS:
        preserved += (delta < t).astype(np.float64)
    preserved /= len(LDDT_THRESHOLDS)

    if per_residue:
        num_res = int(residue_index.max()) + 1 if n else 0
        scores = np.zeros(num_res)
        for r in range(num_res):
            rows = residue_index == r
            m = pair_mask[rows]
            total = m.sum()
            scores[r] = (
                (preserved[rows] * m).sum() / total if total > 0 else 0.0
            )
        return scores
    total = pair_mask.sum()
    return float((preserved * pair_mask).sum() / total) if total else 0.0


def _superposition_pool(pred, native, d0: float, max_iters: int = 20):
    """Zhang-Skolnick style search: seed from fragments, iteratively refine
    on the subset of close pairs."""
    n = pred.shape[0]
    seeds = []
    for frag in (n, max(n // 2, 4), max(n // 4, 4)):
        for start in range(0, max(n - frag + 1, 1), max(frag // 2, 1)):
            seeds.append(slice(start, start + frag))
    best_transforms = []
    for sl in seeds:
        if pred[sl].shape[0] < 3:
            continue
        rot, trans = kabsch(pred[sl], native[sl])
        for _ in range(max_iters):
            moved = pred @ rot.T + trans
            d = np.linalg.norm(moved - native, axis=-1)
            cutoff = max(d0, 0.5)
            sel = d < cutoff
            while sel.sum() < 3:
                cutoff += 0.5
                sel = d < cutoff
            new_rot, new_trans = kabsch(pred[sel], native[sel])
            if np.allclose(new_rot, rot, atol=1e-7) and np.allclose(
                new_trans, trans, atol=1e-7
            ):
                break
            rot, trans = new_rot, new_trans
        best_transforms.append((rot, trans))
    return best_transforms


def tm_score(pred: np.ndarray, native: np.ndarray) -> float:
    """TM-score of matched Ca sets (normalized by the native length)."""
    n = native.shape[0]
    if n < 3:
        return 0.0
    d0 = max(1.24 * np.cbrt(max(n - 15, 1)) - 1.8, 0.5)
    best = 0.0
    for rot, trans in _superposition_pool(pred, native, d0):
        moved = pred @ rot.T + trans
        d = np.linalg.norm(moved - native, axis=-1)
        best = max(best, float(np.mean(1.0 / (1.0 + (d / d0) ** 2))))
    return best


def gdt(pred: np.ndarray, native: np.ndarray, thresholds) -> float:
    n = native.shape[0]
    if n < 3:
        return 0.0
    d0 = max(1.24 * np.cbrt(max(n - 15, 1)) - 1.8, 0.5)
    pool = _superposition_pool(pred, native, d0)
    fractions = []
    for t in thresholds:
        best = 0.0
        for rot, trans in pool:
            moved = pred @ rot.T + trans
            d = np.linalg.norm(moved - native, axis=-1)
            best = max(best, float((d < t).mean()))
        fractions.append(best)
    return float(np.mean(fractions))


def gdt_ts(pred, native) -> float:
    return gdt(pred, native, GDT_TS_THRESHOLDS)


def gdt_ha(pred, native) -> float:
    return gdt(pred, native, GDT_HA_THRESHOLDS)


def maxsub(pred: np.ndarray, native: np.ndarray, d: float = 3.5) -> float:
    """MaxSub: largest superimposable subset within d Å, as a fraction."""
    n = native.shape[0]
    if n < 3:
        return 0.0
    best = 0.0
    for rot, trans in _superposition_pool(pred, native, d):
        moved = pred @ rot.T + trans
        dist = np.linalg.norm(moved - native, axis=-1)
        best = max(best, float((dist < d).mean()))
    return best


def structure_scores(
    pred_ca: np.ndarray, native_ca: np.ndarray
) -> Dict[str, float]:
    """The TM-score-binary metric bundle (reference
    calculate_tmscore_metrics, src/models/__init__.py:269-298)."""
    return {
        "TM-score": tm_score(pred_ca, native_ca),
        "GDT-TS": gdt_ts(pred_ca, native_ca),
        "GDT-HA": gdt_ha(pred_ca, native_ca),
        "MaxSub": maxsub(pred_ca, native_ca),
        "RMSD": rmsd(pred_ca, native_ca),
    }
