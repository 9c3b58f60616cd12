"""AR datamodule: AF2 decoy + native PDB pairs -> all-atom refinement graphs.

Re-design of ``ARDataset``/``ARDataModule``
(/root/reference/src/datamodules/components/ar_dataset.py,
src/utils/ar_utils.py) on the pure-Python PDB parser:

- node scalars ``[residue one-hot (21) ‖ atom-name one-hot (37) ‖ ESM-2
  (1280)]`` = 1338 dims, orientation node vectors;
- per-residue local frames from N/CA/C with a virtual Cb
  (ar_utils.py:191-253); each edge carries 13 invariant pair features
  (frame-projected displacement p and frame-alignment rows q/k/t, plus a
  covalent-bond flag) + RBF16 = 29 edge scalars;
- hybrid connectivity: top-``k_max`` nearest atoms OR atom-index
  separation < ``k_min`` (ar_dataset.py:157-194);
- training crops to 250 contiguous residues; inference splits sequences
  >= 1500 residues into 900-residue windows shifted by 850 with overlap
  trimming (ar_dataset.py:283-377);
- labels are the native atom positions aligned by residue/atom name.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from gcpnet_tpu.data.batching import Bucket, batches_from_dataset
from gcpnet_tpu.data.eq import EQ_ATOM_TYPES, THREE_TO_ONE, structure_sequence
from gcpnet_tpu.data.esm import embed_sequence
from gcpnet_tpu.data.features import normalize, orientations, rbf
from gcpnet_tpu.data.pdb import Structure, parse_pdb
from gcpnet_tpu.graph import GraphBatch, GraphData
from gcpnet_tpu.utils.pylogger import get_pylogger

log = get_pylogger(__name__)

TRAINING_SEQUENCE_CROP_LENGTH = 250
INFERENCE_WINDOW = 900
INFERENCE_SHIFT = 850
INFERENCE_MIN_SPLIT_LEN = 1500

AA_ORDER = "ARNDCQEGHILKMFPSTWYVX"
AA_INDEX = {a: i for i, a in enumerate(AA_ORDER)}

# single-bond covalent radii (Å), Heyrovska-style values
# (reference covalent_helper.py:19-138, condensed to the elements that
# occur in protein heavy atoms)
COVALENT_RADII = {"C": 0.77, "N": 0.70, "O": 0.66, "S": 1.04, "P": 1.10,
                  "H": 0.37}
COVALENT_TOLERANCE = 0.2


def residue_frames(
    n: np.ndarray, ca: np.ndarray, c: np.ndarray
) -> np.ndarray:
    """Per-residue local frames [R, 3, 3] from backbone N/CA/C with a
    reconstructed Cb direction (ar_utils.py:205-231)."""
    b = ca - n
    cvec = c - ca
    a = np.cross(b, cvec)
    cb = -0.58273431 * a + 0.56802827 * b + -0.54067466 * cvec
    z = normalize(cb)
    x = normalize(np.cross(ca - n, z))
    y = normalize(np.cross(z, x))
    return np.stack([x, y, z], axis=1)  # rows are the frame axes


def _per_residue_backbone(s: Structure):
    """Returns (n, ca, c) [R, 3] arrays; residues missing backbone atoms
    reuse their Ca (or zeros) so frames stay finite."""
    res_idx = s.residue_index()
    num_res = int(res_idx.max()) + 1 if len(s.atoms) else 0
    n = np.zeros((num_res, 3), np.float32)
    ca = np.zeros((num_res, 3), np.float32)
    c = np.zeros((num_res, 3), np.float32)
    seen = {"N": np.zeros(num_res, bool), "CA": np.zeros(num_res, bool),
            "C": np.zeros(num_res, bool)}
    coords = s.coords
    for i, atom in enumerate(s.atoms):
        if atom.name in seen and not seen[atom.name][res_idx[i]]:
            {"N": n, "CA": ca, "C": c}[atom.name][res_idx[i]] = coords[i]
            seen[atom.name][res_idx[i]] = True
    for arr, flag in ((n, seen["N"]), (c, seen["C"])):
        arr[~flag] = ca[~flag]
    return n, ca, c


def hybrid_knn_edges(
    coords: np.ndarray, k_min: int, k_max: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Edges = top-k_max nearest atoms OR |i - j| < k_min
    (ar_dataset.py:157-194; senders=center i, receivers=j per reference's
    (src=i, dst=j) convention)."""
    n = coords.shape[0]
    try:
        from gcpnet_tpu.data.native import hybrid_knn_graph_native

        return hybrid_knn_graph_native(coords.astype(np.float32), k_min, k_max)
    except Exception:
        pass
    d = np.linalg.norm(coords[:, None, :] - coords[None, :, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    k = min(k_max, n - 1)
    nbr = np.argpartition(d, kth=k - 1, axis=1)[:, :k]
    adj = np.zeros((n, n), dtype=bool)
    rows = np.repeat(np.arange(n), k)
    adj[rows, nbr.reshape(-1)] = True
    idx = np.arange(n)
    sep = np.abs(idx[:, None] - idx[None, :])
    adj |= sep < k_min
    np.fill_diagonal(adj, False)
    senders, receivers = np.nonzero(adj)
    return senders.astype(np.int32), receivers.astype(np.int32)


def covalent_flags(
    coords: np.ndarray, elements: List[str], senders, receivers
) -> np.ndarray:
    """Covalent-radius bond detection per edge
    (reference covalent_helper.compute_covalent_bond_matrix:510)."""
    r = np.asarray(
        [COVALENT_RADII.get(e, 0.77) for e in elements], dtype=np.float32
    )
    d = np.linalg.norm(coords[senders] - coords[receivers], axis=-1)
    cutoff = r[senders] + r[receivers] + COVALENT_TOLERANCE
    return (d <= cutoff).astype(np.float32)


def pair_frame_features(
    coords: np.ndarray,
    frames: np.ndarray,
    atom_res: np.ndarray,
    senders,
    receivers,
) -> np.ndarray:
    """12 invariant pair features per edge: p = F_i (x_j - x_i) and
    q/k/t = F_i @ axes of F_j (ar_utils.py:241-253, sparse form)."""
    f_i = frames[atom_res[senders]]  # [E, 3, 3]
    f_j = frames[atom_res[receivers]]
    disp = coords[receivers] - coords[senders]
    p = np.einsum("eab,eb->ea", f_i, disp)
    q = np.einsum("eab,eb->ea", f_i, f_j[:, 0])
    k = np.einsum("eab,eb->ea", f_i, f_j[:, 1])
    t = np.einsum("eab,eb->ea", f_i, f_j[:, 2])
    return np.concatenate([p, q, k, t], axis=-1).astype(np.float32)


def _match_native_positions(decoy: Structure, native: Structure):
    """Native atom positions aligned to the decoy's atom order; unmatched
    atoms fall back to the decoy position (masked out of the loss by the
    reference's TM-score threshold filter upstream)."""
    native_map = {}
    for i, a in enumerate(native.atoms):
        native_map[(a.chain, a.resseq, a.icode, a.name)] = i
    coords = decoy.coords.copy()
    ncoords = native.coords
    matched = np.zeros(len(decoy.atoms), dtype=bool)
    for i, a in enumerate(decoy.atoms):
        j = native_map.get((a.chain, a.resseq, a.icode, a.name))
        if j is not None:
            coords[i] = ncoords[j]
            matched[i] = True
    return coords, matched


def featurize_refinement_pair(
    decoy_path: str,
    native_path: Optional[str],
    esm_cache_dir: Optional[str] = None,
    k_min: int = 12,
    k_max: int = 128,
    rbf_edge_dist_cutoff: float = 4.5,
    num_rbf: int = 16,
    residue_range: Optional[Tuple[int, int]] = None,
    subset_to_backbone_atoms_only: bool = False,
) -> GraphData:
    s = parse_pdb(decoy_path, heavy_only=True)
    if not s.atoms:
        raise ValueError(f"no atoms parsed from {decoy_path}")
    if subset_to_backbone_atoms_only:
        keep = [
            i for i, a in enumerate(s.atoms) if a.name in ("N", "CA", "C")
        ]
        s = Structure([s.atoms[i] for i in keep])

    res_idx = s.residue_index()
    if residue_range is not None:
        lo, hi = residue_range
        keep = (res_idx >= lo) & (res_idx < hi)
        s = Structure([a for a, k in zip(s.atoms, keep) if k])
        res_idx = s.residue_index()

    coords = s.coords
    num_res = int(res_idx.max()) + 1
    elements = s.elements

    # node scalars
    seq = structure_sequence(s)
    res_onehot = np.zeros((num_res, len(AA_ORDER)), np.float32)
    for r, aa in enumerate(seq):
        res_onehot[r, AA_INDEX.get(aa, AA_INDEX["X"])] = 1.0
    atom_onehot = np.zeros((len(s.atoms), len(EQ_ATOM_TYPES)), np.float32)
    for i, a in enumerate(s.atoms):
        j = EQ_ATOM_TYPES.index(a.name) if a.name in EQ_ATOM_TYPES else -1
        if j >= 0:
            atom_onehot[i, j] = 1.0
    esm_res = embed_sequence(seq, cache_dir=esm_cache_dir)
    if esm_res.shape[0] != num_res:
        esm_res = np.zeros((num_res, esm_res.shape[1]), np.float32)
    h = np.concatenate(
        [res_onehot[res_idx], atom_onehot, esm_res[res_idx]], axis=-1
    ).astype(np.float32)

    chi = np.nan_to_num(orientations(coords))

    # edges + pair features
    senders, receivers = hybrid_knn_edges(coords, k_min, k_max)
    n_bb, ca, c_bb = _per_residue_backbone(s)
    frames = residue_frames(n_bb, ca, c_bb)
    pqkt = pair_frame_features(coords, frames, res_idx, senders, receivers)
    cov = covalent_flags(coords, elements, senders, receivers)[:, None]
    e_vec = coords[senders] - coords[receivers]
    e_rbf = rbf(
        np.linalg.norm(e_vec, axis=-1),
        d_max=rbf_edge_dist_cutoff,
        d_count=num_rbf,
    )
    e = np.nan_to_num(
        np.concatenate([pqkt, cov, e_rbf], axis=-1).astype(np.float32)
    )
    xi = np.nan_to_num(normalize(e_vec)[:, None, :].astype(np.float32))

    label = coords
    if native_path and os.path.exists(native_path):
        native = parse_pdb(native_path, heavy_only=True)
        label, _ = _match_native_positions(s, native)

    return GraphData(
        h=h,
        chi=chi,
        e=e,
        xi=xi,
        x=coords,
        senders=senders,
        receivers=receivers,
        extras={
            "label": label.astype(np.float32),
            "atom_residue_idx": res_idx.astype(np.int32),
            "ca_x_local": ca.astype(np.float32),
            "num_atoms_per_residue": np.bincount(
                res_idx, minlength=num_res
            ).astype(np.int32),
        },
    )


def sliding_windows(num_res: int) -> List[Tuple[int, int, int, int]]:
    """(lo, hi, keep_lo, keep_hi) residue windows for long-sequence
    inference (ar_dataset.py:283-333): window 900, shift 850, the 50-residue
    overlap trimmed from the later window before stitching."""
    if num_res < INFERENCE_MIN_SPLIT_LEN:
        return [(0, num_res, 0, num_res)]
    windows = []
    start = 0
    while start < num_res:
        end = min(start + INFERENCE_WINDOW, num_res)
        keep_lo = start if start == 0 else start + (INFERENCE_WINDOW - INFERENCE_SHIFT)
        windows.append((start, end, keep_lo, end))
        if end == num_res:
            break
        start += INFERENCE_SHIFT
    return windows


class ARDataModule:
    def __init__(
        self,
        splits_dir: str,
        af2_dir: str,
        true_dir: str,
        model_data_cache_dir: Optional[str] = None,
        split_index: int = 1,
        rbf_edge_dist_cutoff: float = 4.5,
        num_rbf: int = 16,
        k_min: int = 12,
        k_max: int = 128,
        max_tmscore_metric_threshold: float = 1.1,
        subset_to_backbone_atoms_only: bool = False,
        batch_size: int = 1,
        num_shards: int = 1,
        max_nodes_per_batch: int = 4096,
        max_residues_per_batch: int = 600,
        predict_input_dir: Optional[str] = None,
        predict_true_dir: Optional[str] = None,
        predict_output_dir: Optional[str] = None,
        esm_cache_dir: Optional[str] = None,
        crop_seed: int = 0,
    ):
        self.splits_dir = splits_dir
        self.af2_dir = af2_dir
        self.true_dir = true_dir
        self.cache_dir = model_data_cache_dir
        self.split_index = split_index
        self.rbf_edge_dist_cutoff = rbf_edge_dist_cutoff
        self.num_rbf = num_rbf
        self.k_min, self.k_max = k_min, k_max
        self.max_tmscore = max_tmscore_metric_threshold
        self.backbone_only = subset_to_backbone_atoms_only
        self.batch_size = batch_size
        self.num_shards = num_shards
        self.max_nodes_per_batch = max_nodes_per_batch
        self.max_residues_per_batch = max_residues_per_batch
        self.predict_input_dir = predict_input_dir
        self.predict_true_dir = predict_true_dir
        self.predict_output_dir = predict_output_dir
        self.esm_cache_dir = esm_cache_dir or (
            os.path.join(model_data_cache_dir, "esm")
            if model_data_cache_dir
            else None
        )
        self.crop_seed = crop_seed
        self.splits: Dict[str, List[str]] = {}
        self.predict_paths: List[str] = []
        self._predict_meta: List[dict] = []
        self._window_coords: Dict[str, List[np.ndarray]] = {}

    def prepare_data(self):
        pass

    def setup(self, stage: Optional[str] = None):
        mapping = {
            "train": f"train{self.split_index}.lst",
            "valid": f"valid{self.split_index}.lst",
            "test": "test_ar.lst",
            "test_casp14": "test_casp14.lst",
            "test_casp14_refinement": "test_casp14_refinement.lst",
        }
        for split, fname in mapping.items():
            path = os.path.join(self.splits_dir, fname)
            if os.path.exists(path):
                with open(path) as f:
                    self.splits[split] = [
                        line.strip() for line in f if line.strip()
                    ]
            else:
                self.splits[split] = []
        log.info(
            "AR splits: "
            + ", ".join(f"{k}={len(v)}" for k, v in self.splits.items())
        )

    def _paths(self, name: str):
        decoy = os.path.join(self.af2_dir, name + ".pdb")
        native = os.path.join(self.true_dir, name + ".pdb")
        if not os.path.exists(decoy):
            decoy = os.path.join(self.af2_dir, name)
        if not os.path.exists(native):
            native = os.path.join(self.true_dir, name)
        return decoy, native

    def _featurize(self, name: str, crop: bool, seed: int = 0):
        decoy, native = self._paths(name)
        cache_path = None
        if self.cache_dir and not crop:
            os.makedirs(self.cache_dir, exist_ok=True)
            suffix = "_bb" if self.backbone_only else ""
            cache_path = os.path.join(self.cache_dir, f"{name}{suffix}.pkl")
            if os.path.exists(cache_path):
                with open(cache_path, "rb") as f:
                    return pickle.load(f)
        residue_range = None
        if crop:
            s = parse_pdb(decoy, heavy_only=True)
            num_res = int(s.residue_index().max()) + 1 if s.atoms else 0
            if num_res > TRAINING_SEQUENCE_CROP_LENGTH:
                rng = np.random.default_rng(seed)
                lo = int(
                    rng.integers(0, num_res - TRAINING_SEQUENCE_CROP_LENGTH + 1)
                )
                residue_range = (lo, lo + TRAINING_SEQUENCE_CROP_LENGTH)
        g = featurize_refinement_pair(
            decoy, native,
            esm_cache_dir=self.esm_cache_dir,
            k_min=self.k_min, k_max=self.k_max,
            rbf_edge_dist_cutoff=self.rbf_edge_dist_cutoff,
            num_rbf=self.num_rbf,
            residue_range=residue_range,
            subset_to_backbone_atoms_only=self.backbone_only,
        )
        if cache_path:
            with open(cache_path, "wb") as f:
                pickle.dump(g, f)
        return g

    def _graphs(self, split: str, crop: bool, seed: int = 0):
        from gcpnet_tpu.utils.utils import TimeoutException, time_limit

        for i, name in enumerate(self.splits.get(split, [])):
            try:
                # drop examples whose parsing hangs (reference signal-based
                # time_limit guard, ar_dataset.py:548-557)
                with time_limit(120):
                    yield self._featurize(name, crop=crop, seed=seed + i)
            except (ValueError, OSError, TimeoutException) as exc:
                log.warning(f"skipping {name}: {exc}")

    def _bucket(self) -> Bucket:
        n = self.max_nodes_per_batch
        return Bucket(
            num_nodes=n,
            num_edges=n * (self.k_max + 2 * self.k_min),
            num_graphs=self.batch_size,
        )

    def _sender_budget(self) -> Optional[int]:
        """Max OUT-degree bound of the hybrid-kNN graph: each center i picks
        k_max nearest plus the < k_min sequential window (2*(k_min-1)
        neighbors), so out-degree <= k_max + 2*k_min — a sender-dense perm
        (scatter-free sender-keyed aggregation, aggregate_with_row) fits in
        exactly the bucket's per-node edge budget.  IN-degree is unbounded
        (a hub atom can be in many centers' kNN lists), so the
        receiver-dense layout does not apply.

        OFF by default: the sender-dense layout was MEASURED slower than
        plain XLA scatter on v5e at EQ/AR shapes (padding-slot HBM
        traffic > the scatters removed — scripts/bench_eq_step.py,
        RESULTS.md round-4 sender-dense section).  GCPNET_AR_DENSE=1
        re-enables."""
        if os.environ.get("GCPNET_AR_DENSE", "") not in ("1", "true"):
            return None
        return self.k_max + 2 * self.k_min

    def batches(
        self, split: str, shuffle: bool = False, seed: int = 0
    ) -> Iterator[GraphBatch]:
        crop = split == "train"
        for batch in batches_from_dataset(
            self._graphs(split, crop=crop, seed=seed),
            self._bucket(),
            num_shards=self.num_shards,
            shuffle_seed=seed if shuffle else None,
            drop_last=shuffle,
            dense_out_degree=self._sender_budget(),
        ):
            yield _globalize_ar_residues(
                batch, self.max_residues_per_batch, self.num_shards
            )

    def train_batches(self, seed: int = 0):
        return self.batches("train", shuffle=True, seed=seed)

    def val_batches(self):
        return self.batches("valid")

    def test_batches(self):
        return self.batches("test")

    def predict_batches(self) -> Iterator[GraphBatch]:
        input_dir = self.predict_input_dir
        if not input_dir or not os.path.isdir(input_dir):
            return
        for fname in sorted(os.listdir(input_dir)):
            if not fname.endswith(".pdb"):
                continue
            decoy = os.path.join(input_dir, fname)
            native = (
                os.path.join(self.predict_true_dir, fname)
                if self.predict_true_dir
                else None
            )
            s = parse_pdb(decoy, heavy_only=True)
            num_res = int(s.residue_index().max()) + 1 if s.atoms else 0
            windows = sliding_windows(num_res)
            for wi, (lo, hi, keep_lo, keep_hi) in enumerate(windows):
                g = featurize_refinement_pair(
                    decoy, native,
                    esm_cache_dir=self.esm_cache_dir,
                    k_min=self.k_min, k_max=self.k_max,
                    rbf_edge_dist_cutoff=self.rbf_edge_dist_cutoff,
                    num_rbf=self.num_rbf,
                    residue_range=(lo, hi),
                    subset_to_backbone_atoms_only=self.backbone_only,
                )
                res = g.extras["atom_residue_idx"]
                keep_atoms = (res >= keep_lo - lo) & (res < keep_hi - lo)
                g.extras["overlap_keep_mask"] = keep_atoms.astype(np.float32)
                batch = next(
                    batches_from_dataset(
                        [g], self._bucket(), num_shards=1, drop_last=False,
                        dense_out_degree=self._sender_budget(),
                    )
                )
                self.predict_paths.append(decoy)
                self._predict_meta.append(
                    {"decoy": decoy, "last_window": wi == len(windows) - 1}
                )
                # predict path is always single-shard (one window at a time)
                yield _globalize_ar_residues(
                    batch, self.max_residues_per_batch, num_shards=1
                )

    def record_predictions(self, batch, preds, output_dir, decoy=None):
        """Accumulate per-window predictions and write one stitched refined
        PDB per decoy (reference combine_individual_batch_inputs,
        gcpnet_ar_module.py:260-284): each window contributes only its
        non-overlap atoms (``overlap_keep_mask``)."""
        from gcpnet_tpu.data.pdb import parse_pdb as _parse, write_structure

        meta = (
            self._predict_meta.pop(0)
            if self._predict_meta
            else {"decoy": decoy, "last_window": True}
        )
        if decoy is None and self.predict_paths:
            decoy = self.predict_paths.pop(0)
        rows = []
        if decoy:
            mask = np.asarray(batch.node_pad_mask)
            keep = (
                np.asarray(batch.extras["overlap_keep_mask"]).astype(bool)
                if "overlap_keep_mask" in batch.extras
                else np.ones_like(mask)
            )
            coords = np.asarray(preds)[mask & keep]
            self._window_coords.setdefault(decoy, []).append(coords)
            if not meta.get("last_window", True):
                return rows  # wait for the remaining windows
            coords = np.concatenate(self._window_coords.pop(decoy), axis=0)
            s = _parse(decoy, heavy_only=True)
            out_path = os.path.join(output_dir, os.path.basename(decoy))
            n = min(len(s.atoms), coords.shape[0])
            write_structure(
                out_path, Structure(s.atoms[:n]), coords=coords[:n]
            )
            row = {"decoy": os.path.basename(decoy), "refined_pdb": out_path}
            # score vs the native structure when available (reference AR
            # test protocol: TM-score/GDT/MaxSub/RMSD + lDDT,
            # gcpnet_ar_module.py:368-434; native implementations here)
            native = (
                os.path.join(self.predict_true_dir, os.path.basename(decoy))
                if self.predict_true_dir
                else None
            )
            if native and os.path.exists(native):
                try:
                    from gcpnet_tpu.utils.external_tools import (
                        calculate_tmscore_metrics,
                        generate_lddt_score,
                    )

                    row.update(calculate_tmscore_metrics(out_path, native))
                    row["lDDT"] = float(
                        generate_lddt_score(
                            out_path, native, per_residue=False
                        )
                    )
                except Exception as exc:
                    log.warning(f"scoring failed for {decoy}: {exc}")
            rows.append(row)
        return rows


def _globalize_ar_residues(
    batch: GraphBatch, max_residues: int, num_shards: int = 1
) -> GraphBatch:
    """Host-side batch-local -> shard-global residue indices and a padded
    per-shard ``ca_x`` table (the reference does the Ca-offset loop on
    device, gcpnet_ar_module.py:163-175).  With ``num_shards > 1`` each
    shard's block is self-contained so shard_map's P('dp') split works."""
    res_idx = np.asarray(batch.extras["atom_residue_idx"]).copy()
    graph_id = np.asarray(batch.graph_id)
    node_mask = np.asarray(batch.node_pad_mask)
    ca_local = np.asarray(batch.extras["ca_x_local"])

    n_per_shard = res_idx.shape[0] // num_shards
    c_per_shard = ca_local.shape[0] // num_shards

    new_res_idx = np.zeros_like(res_idx)
    shard_tables = []
    for s in range(num_shards):
        rows_s = slice(s * n_per_shard, (s + 1) * n_per_shard)
        gid = graph_id[rows_s]
        mask_s = node_mask[rows_s]
        ridx = res_idx[rows_s]
        ca_s = ca_local[s * c_per_shard : (s + 1) * c_per_shard]

        new_local = np.zeros_like(ridx)
        offset = 0
        ptr = 0
        ca_rows = []
        for g in np.unique(gid[mask_s]):
            rows = mask_s & (gid == g)
            local = ridx[rows]
            n_res = int(local.max()) + 1 if rows.any() else 0
            new_local[rows] = local + offset
            ca_rows.append(ca_s[ptr : ptr + n_res])
            ptr += n_res
            offset += n_res
        new_res_idx[rows_s] = new_local

        ca = (
            np.concatenate(ca_rows) if ca_rows else np.zeros((0, 3), np.float32)
        )
        if ca.shape[0] > max_residues:
            raise ValueError(
                f"shard {s} holds {ca.shape[0]} residues > budget "
                f"{max_residues} (raise max_residues_per_batch)"
            )
        pad = max_residues - ca.shape[0]
        shard_tables.append(np.pad(ca, ((0, pad), (0, 0))).astype(np.float32))

    extras = dict(batch.extras)
    extras["atom_residue_idx"] = new_res_idx
    extras["ca_x"] = np.concatenate(shard_tables)
    extras.pop("ca_x_local", None)
    return batch.replace(extras=extras)
