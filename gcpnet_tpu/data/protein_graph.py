"""Residue-level protein graph featurization (numpy).

Re-design of ``ProteinGraphDataset``
(/root/reference/src/datamodules/components/protein_graph_dataset.py:26-236)
for the host pipeline: CATH backbone coordinates -> kNN residue graphs with
dihedral (6), orientation (2 vec) and sidechain-direction (1 vec) node
features, RBF + sinusoidal relative-position edge scalars and unit edge
vectors.  Residues with non-finite coordinates are masked and excluded from
the kNN candidate set.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import numpy as np

from gcpnet_tpu.data.features import normalize, rbf
from gcpnet_tpu.graph import GraphData

AA_LETTER_TO_NUM = {
    "C": 4, "D": 3, "S": 15, "Q": 5, "K": 11, "I": 9, "P": 14, "T": 16,
    "F": 13, "A": 0, "G": 7, "H": 8, "E": 6, "L": 10, "R": 1, "W": 17,
    "V": 19, "N": 2, "Y": 18, "M": 12,
}
AA_NUM_TO_LETTER = {v: k for k, v in AA_LETTER_TO_NUM.items()}

DEFAULT_FEATURES_CFG = dict(
    dihedral=True, orientations=True, sidechain=True,
    relative_distance=True, relative_position=True, direction_unit=True,
)


def knn_graph(
    x: np.ndarray, k: int, valid: Optional[np.ndarray] = None
):
    """k nearest neighbors per node -> (senders=neighbor, receivers=center).

    Masked (invalid) nodes receive no edges and are never candidates,
    matching the reference's inf-coordinate trick
    (protein_graph_dataset.py:122-126).
    """
    n = x.shape[0]
    if valid is None:
        valid = np.ones(n, dtype=bool)
    try:
        from gcpnet_tpu.data.native import knn_graph_native

        finite = np.where(
            valid[:, None] & np.isfinite(x).all(-1, keepdims=True), x, 0.0
        )
        return knn_graph_native(
            finite.astype(np.float32), k,
            valid=valid & np.isfinite(x).all(-1),
        )
    except Exception:
        pass
    with np.errstate(invalid="ignore"):
        d2 = np.sum((x[:, None, :] - x[None, :, :]) ** 2, axis=-1)
    d2[~np.isfinite(d2)] = np.inf
    np.fill_diagonal(d2, np.inf)
    d2[:, ~valid] = np.inf
    d2[~valid, :] = np.inf

    k_eff = min(k, max(n - 1, 1))
    nbr = np.argpartition(d2, kth=k_eff - 1, axis=1)[:, :k_eff]
    senders, receivers = [], []
    for i in range(n):
        cand = nbr[i]
        cand = cand[np.isfinite(d2[i, cand])]
        # sort by distance for determinism
        cand = cand[np.argsort(d2[i, cand], kind="stable")]
        senders.append(cand)
        receivers.append(np.full(cand.shape[0], i, dtype=np.int64))
    senders = np.concatenate(senders).astype(np.int32)
    receivers = np.concatenate(receivers).astype(np.int32)
    return senders, receivers


def dihedral_features(coords: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    """phi/psi/omega backbone dihedrals lifted to (cos, sin) — [R, 6]
    (reference :169-196)."""
    X = coords[:, :3].reshape(-1, 3)
    dX = X[1:] - X[:-1]
    U = normalize(dX)
    u_2, u_1, u_0 = U[:-2], U[1:-1], U[2:]
    n_2 = normalize(np.cross(u_2, u_1))
    n_1 = normalize(np.cross(u_1, u_0))
    cosD = np.clip(np.sum(n_2 * n_1, -1), -1 + eps, 1 - eps)
    D = np.sign(np.sum(u_2 * n_1, -1)) * np.arccos(cosD)
    D = np.concatenate([np.zeros(1), D, np.zeros(2)])
    D = D.reshape(-1, 3)
    return np.concatenate([np.cos(D), np.sin(D)], axis=1).astype(np.float32)


def positional_embeddings(
    senders: np.ndarray, receivers: np.ndarray, num_embeddings: int = 16
) -> np.ndarray:
    """Sinusoidal embedding of the sequence separation per edge
    (reference :198-213)."""
    d = (senders - receivers).astype(np.float32)
    frequency = np.exp(
        np.arange(0, num_embeddings, 2, dtype=np.float32)
        * -(math.log(10000.0) / num_embeddings)
    )
    angles = d[:, None] * frequency[None, :]
    return np.concatenate([np.cos(angles), np.sin(angles)], axis=-1).astype(
        np.float32
    )


def orientation_features(x_ca: np.ndarray) -> np.ndarray:
    forward = normalize(x_ca[1:] - x_ca[:-1])
    backward = normalize(x_ca[:-1] - x_ca[1:])
    forward = np.concatenate([forward, np.zeros((1, 3), np.float32)], 0)
    backward = np.concatenate([np.zeros((1, 3), np.float32), backward], 0)
    return np.stack([forward, backward], axis=1).astype(np.float32)


def sidechain_features(coords: np.ndarray) -> np.ndarray:
    """Imputed C-beta direction from N/CA/C (reference :222-232)."""
    n, origin, c = coords[:, 0], coords[:, 1], coords[:, 2]
    c, n = normalize(c - origin), normalize(n - origin)
    bisector = normalize(c + n)
    perp = normalize(np.cross(c, n))
    vec = -bisector * math.sqrt(1 / 3) - perp * math.sqrt(2 / 3)
    return vec.astype(np.float32)


def featurize_protein(
    protein: Dict[str, Any],
    features_cfg: Optional[Dict[str, bool]] = None,
    top_k: int = 30,
    num_rbf: int = 16,
    num_positional_embeddings: int = 16,
) -> GraphData:
    """One CATH chain record {'seq', 'coords' [R,4,3], 'name'} -> GraphData."""
    fc = dict(DEFAULT_FEATURES_CFG)
    fc.update(features_cfg or {})

    coords = np.asarray(protein["coords"], dtype=np.float32)
    seq = np.asarray(
        [AA_LETTER_TO_NUM[a] for a in protein["seq"]], dtype=np.int32
    )
    mask = np.isfinite(coords.sum(axis=(1, 2)))
    safe_coords = np.where(mask[:, None, None], coords, 0.0)

    x_ca = safe_coords[:, 1]
    senders, receivers = knn_graph(
        np.where(mask[:, None], x_ca, np.inf), top_k, valid=mask
    )

    pos_emb = positional_embeddings(
        senders, receivers, num_positional_embeddings
    )
    e_vec = x_ca[senders] - x_ca[receivers]
    e_rbf = rbf(np.linalg.norm(e_vec, axis=-1), d_count=num_rbf)

    dihedrals = dihedral_features(safe_coords)
    if not fc["dihedral"]:
        dihedrals = np.zeros_like(dihedrals)
    orient = orientation_features(x_ca)
    if not fc["orientations"]:
        orient = np.zeros_like(orient)
    side = sidechain_features(safe_coords)
    if not fc["sidechain"]:
        side = np.zeros_like(side)
    if not fc["relative_distance"]:
        e_rbf = np.zeros_like(e_rbf)
    if not fc["relative_position"]:
        pos_emb = np.zeros_like(pos_emb)
    if not fc["direction_unit"]:
        e_vec = np.zeros_like(e_vec)

    node_s = np.nan_to_num(dihedrals)
    node_v = np.nan_to_num(
        np.concatenate([orient, side[:, None, :]], axis=1)
    )
    edge_s = np.nan_to_num(np.concatenate([e_rbf, pos_emb], axis=-1))
    edge_v = np.nan_to_num(normalize(e_vec)[:, None, :])

    return GraphData(
        h=node_s.astype(np.float32),
        chi=node_v.astype(np.float32),
        e=edge_s.astype(np.float32),
        xi=edge_v.astype(np.float32),
        x=x_ca.astype(np.float32),
        senders=senders,
        receivers=receivers,
        node_mask=mask,
        extras={"seq": seq},
    )
