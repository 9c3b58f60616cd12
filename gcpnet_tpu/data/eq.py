"""EQ datamodule: decoy PDBs -> all-atom structure-quality graphs.

Re-design of ``EQDataset``/``EQDataModule``
(/root/reference/src/datamodules/components/eq_dataset.py,
eq_datamodule.py) on the pure-Python PDB parser:

- all-atom (heavy-atom) graphs with radius-graph topology (r=4.5, max 32);
- node scalars ``[ESM-2 residue embedding (1280) ‖ AlphaFold plDDT from
  b-factors (1)]`` plus an atom-type index embedded in the model;
- edge scalars ``[same-chain flag, same-residue flag, RBF16]``, unit edge
  vectors;
- per-residue lDDT labels vs the native structure, computed natively
  (gcpnet_tpu.utils.structure_metrics.lddt) or via the ``lddt`` binary when
  configured;
- processed graphs cached as ``.npz``.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Iterator, List, Optional

import numpy as np

from gcpnet_tpu.data.atom3d import radius_graph
from gcpnet_tpu.data.batching import Bucket, batches_from_dataset
from gcpnet_tpu.data.esm import embed_sequence
from gcpnet_tpu.data.features import edge_geometric_features, orientations
from gcpnet_tpu.data.pdb import Structure, parse_pdb
from gcpnet_tpu.graph import GraphBatch, GraphData
from gcpnet_tpu.utils.pylogger import get_pylogger
from gcpnet_tpu.utils.structure_metrics import lddt as lddt_native

log = get_pylogger(__name__)

# heavy-atom name vocabulary (reference eq_dataset.py ATOM_TYPES, 37 names
# + UNK); index 37 is unknown
EQ_ATOM_TYPES = [
    "N", "CA", "C", "O", "CB", "OG", "CG", "CD1", "CD2", "CE1", "CE2", "CZ",
    "OD1", "ND2", "CG1", "CG2", "CD", "CE", "NZ", "OD2", "OE1", "NE2", "OE2",
    "OH", "NE", "NH1", "NH2", "OG1", "SD", "ND1", "SG", "NE1", "CE3", "CZ2",
    "CZ3", "CH2", "OXT",
]
EQ_ATOM_TYPE_INDEX = {name: i for i, name in enumerate(EQ_ATOM_TYPES)}

THREE_TO_ONE = {
    "ALA": "A", "ARG": "R", "ASN": "N", "ASP": "D", "CYS": "C", "GLN": "Q",
    "GLU": "E", "GLY": "G", "HIS": "H", "ILE": "I", "LEU": "L", "LYS": "K",
    "MET": "M", "PHE": "F", "PRO": "P", "SER": "S", "THR": "T", "TRP": "W",
    "TYR": "Y", "VAL": "V",
}


def structure_sequence(s: Structure) -> str:
    seq = []
    seen = set()
    for a in s.atoms:
        rid = (a.chain, a.resseq, a.icode)
        if rid not in seen:
            seen.add(rid)
            seq.append(THREE_TO_ONE.get(a.resname, "X"))
    return "".join(seq)


def featurize_decoy(
    decoy_path: str,
    native_path: Optional[str],
    esm_cache_dir: Optional[str] = None,
    edge_cutoff: float = 4.5,
    max_neighbors: int = 32,
    rbf_edge_dist_cutoff: float = 4.5,
    num_rbf: int = 16,
    lddt_exec_path: Optional[str] = None,
    subset_to_ca_atoms_only: bool = False,
) -> GraphData:
    """One decoy (+ optional native for labels) -> GraphData."""
    s = parse_pdb(decoy_path, heavy_only=True)
    if not s.atoms:
        raise ValueError(f"no atoms parsed from {decoy_path}")
    res_idx = s.residue_index()
    num_res = int(res_idx.max()) + 1
    chain_ids = np.asarray(
        [(ord(a.chain[0]) if a.chain else 0) % 97 for a in s.atoms],
        dtype=np.int32
    )
    coords = s.coords
    atom_types = np.asarray(
        [EQ_ATOM_TYPE_INDEX.get(a.name, len(EQ_ATOM_TYPES)) for a in s.atoms],
        dtype=np.int32,
    )
    plddt_res = np.zeros(num_res, dtype=np.float32)
    for i, a in enumerate(s.atoms):
        plddt_res[res_idx[i]] = a.bfactor  # AlphaFold stores plDDT in b-factor
    plddt_atom = plddt_res[res_idx]

    seq = structure_sequence(s)
    esm_res = embed_sequence(seq, cache_dir=esm_cache_dir)
    if esm_res.shape[0] != num_res:  # defensive: sequence/residue mismatch
        esm_res = np.zeros((num_res, esm_res.shape[1]), np.float32)
    esm_atom = esm_res[res_idx]

    if subset_to_ca_atoms_only:
        keep = s.ca_indices()
        coords = coords[keep]
        atom_types = atom_types[keep]
        chain_ids = chain_ids[keep]
        plddt_atom = plddt_atom[keep]
        esm_atom = esm_atom[keep]
        res_idx = np.arange(keep.shape[0], dtype=np.int32)
        edge_cutoff, max_neighbors = 8.0, 128
        rbf_edge_dist_cutoff = 8.0

    senders, receivers = radius_graph(coords, edge_cutoff, max_neighbors)
    e_rbf, e_vec = edge_geometric_features(
        coords, senders, receivers, d_max=rbf_edge_dist_cutoff, num_rbf=num_rbf
    )
    same_chain = (chain_ids[senders] == chain_ids[receivers]).astype(
        np.float32
    )[:, None]
    same_res = (res_idx[senders] == res_idx[receivers]).astype(np.float32)[
        :, None
    ]
    edge_s = np.concatenate([same_chain, same_res, e_rbf], axis=-1)

    h = np.concatenate([esm_atom, plddt_atom[:, None]], axis=-1).astype(
        np.float32
    )
    chi = np.nan_to_num(orientations(coords))

    label = np.zeros(num_res, dtype=np.float32)
    if native_path is not None and os.path.exists(native_path):
        label_arr = _per_residue_lddt(
            decoy_path, native_path, num_res, lddt_exec_path
        )
        if label_arr is not None:
            label = label_arr

    ca_idx = s.ca_indices() if not subset_to_ca_atoms_only else np.arange(
        coords.shape[0], dtype=np.int32
    )

    return GraphData(
        h=h,
        chi=chi,
        e=edge_s,
        xi=e_vec,
        x=coords,
        senders=senders,
        receivers=receivers,
        node_mask=np.ones(coords.shape[0], dtype=bool),
        extras={
            "atom_types": atom_types,
            "atom_residue_idx": res_idx.astype(np.int32),
            "label": label,
            "res_mask": np.ones(num_res, dtype=np.float32),
            "ca_atom_idx": ca_idx,
        },
    )


def _per_residue_lddt(decoy_path, native_path, num_res, lddt_exec_path):
    try:
        from gcpnet_tpu.utils.external_tools import generate_lddt_score

        scores = generate_lddt_score(
            decoy_path, native_path, lddt_exec_path, per_residue=True
        )
        scores = np.asarray(scores, dtype=np.float32)
        if scores.shape[0] == num_res:
            return scores
        out = np.zeros(num_res, dtype=np.float32)
        out[: min(num_res, scores.shape[0])] = scores[:num_res]
        return out
    except Exception as exc:
        log.warning(f"lDDT labeling failed for {decoy_path}: {exc}")
        return None


class EQDataModule:
    def __init__(
        self,
        splits_dir: str,
        decoy_dir: str,
        true_dir: str,
        model_data_cache_dir: Optional[str] = None,
        edge_cutoff: float = 4.5,
        max_neighbors: int = 32,
        rbf_edge_dist_cutoff: float = 4.5,
        num_rbf: int = 16,
        lddt_exec_path: Optional[str] = None,
        subset_to_ca_atoms_only: bool = False,
        batch_size: int = 1,
        num_shards: int = 1,
        max_nodes_per_batch: int = 8192,
        max_residues_per_batch: int = 1100,
        predict_input_dir: Optional[str] = None,
        predict_true_dir: Optional[str] = None,
        predict_output_dir: Optional[str] = None,
        esm_cache_dir: Optional[str] = None,
    ):
        self.splits_dir = splits_dir
        self.decoy_dir = decoy_dir
        self.true_dir = true_dir
        self.cache_dir = model_data_cache_dir
        self.edge_cutoff = edge_cutoff
        self.max_neighbors = max_neighbors
        self.rbf_edge_dist_cutoff = rbf_edge_dist_cutoff
        self.num_rbf = num_rbf
        self.lddt_exec_path = lddt_exec_path
        self.subset_to_ca = subset_to_ca_atoms_only
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
        self.splits: Dict[str, List[str]] = {}
        self.predict_paths: List[str] = []

    def prepare_data(self):
        pass  # EQ data ships as PDB directories; nothing to download

    def setup(self, stage: Optional[str] = None):
        for split, fname in (
            ("train", "train.lst"),
            ("valid", "valid.lst"),
            ("test", "test.lst"),
        ):
            path = os.path.join(self.splits_dir, fname)
            if os.path.exists(path):
                with open(path) as f:
                    self.splits[split] = [
                        line.strip() for line in f if line.strip()
                    ]
            else:
                self.splits[split] = []
        log.info(
            "EQ splits: "
            + ", ".join(f"{k}={len(v)}" for k, v in self.splits.items())
        )

    def _decoy_path(self, name: str) -> str:
        for cand in (name, name + ".pdb"):
            p = os.path.join(self.decoy_dir, cand)
            if os.path.exists(p):
                return p
        return os.path.join(self.decoy_dir, name)

    def _native_path(self, name: str) -> Optional[str]:
        base = name.split("_")[0]
        for cand in (name, name + ".pdb", base, base + ".pdb"):
            p = os.path.join(self.true_dir, cand)
            if os.path.exists(p):
                return p
        return None

    def _cached_featurize(self, name: str, with_labels: bool = True):
        cache_path = None
        if self.cache_dir:
            os.makedirs(self.cache_dir, exist_ok=True)
            suffix = "_ca" if self.subset_to_ca else ""
            cache_path = os.path.join(self.cache_dir, f"{name}{suffix}.pkl")
            if os.path.exists(cache_path):
                with open(cache_path, "rb") as f:
                    return pickle.load(f)
        g = featurize_decoy(
            self._decoy_path(name),
            self._native_path(name) if with_labels else None,
            esm_cache_dir=self.esm_cache_dir,
            edge_cutoff=self.edge_cutoff,
            max_neighbors=self.max_neighbors,
            rbf_edge_dist_cutoff=self.rbf_edge_dist_cutoff,
            num_rbf=self.num_rbf,
            lddt_exec_path=self.lddt_exec_path,
            subset_to_ca_atoms_only=self.subset_to_ca,
        )
        if cache_path:
            with open(cache_path, "wb") as f:
                pickle.dump(g, f)
        return g

    def _graphs(self, split: str):
        for name in self.splits.get(split, []):
            try:
                g = self._cached_featurize(name)
            except (ValueError, OSError) as exc:
                log.warning(f"skipping {name}: {exc}")
                continue
            yield g

    def _bucket(self) -> Bucket:
        n = self.max_nodes_per_batch
        return Bucket(
            num_nodes=n,
            num_edges=n * self.max_neighbors,
            num_graphs=self.batch_size,
        )

    def _dense_budgets(self):
        """DENSE fixed-degree layout budgets — OFF by default for EQ.

        The EQ trunk aggregates by SENDER (aggregate_with_row), whose
        degree the featurizer does not cap; covering the out-degree tail
        (max ~1.75x mean) forces padding slots whose HBM traffic was
        MEASURED to cost more than the XLA scatters it removes: on one
        v5e at EQ bench scale (scripts/bench_eq_step.py, 8k nodes/262k
        edges, 5 GCPInteractions2 layers) plain scatter runs 133.4
        ms/step vs 186.8 dense at out-budget 64 and 167.1 at 52.  The
        machinery stays for bounded-out-degree graph families
        (GCPNET_EQ_DENSE=1 re-enables: receiver budget = the featurizer
        in-cap, sender budget 2x).  The CA-only mode overrides the
        featurizer's cap internally (cutoff 8.0, cap 128), so the
        datamodule-level budget would be wrong there regardless."""
        if self.subset_to_ca or os.environ.get("GCPNET_EQ_DENSE", "") not in (
            "1", "true",
        ):
            return None, None
        return self.max_neighbors, 2 * self.max_neighbors

    def batches(
        self, split: str, shuffle: bool = False, seed: int = 0
    ) -> Iterator[GraphBatch]:
        dense_degree, dense_out = self._dense_budgets()
        for batch in batches_from_dataset(
            self._graphs(split),
            self._bucket(),
            num_shards=self.num_shards,
            shuffle_seed=seed if shuffle else None,
            drop_last=shuffle,
            dense_degree=dense_degree,
            dense_out_degree=dense_out,
        ):
            yield _globalize_residues(
                batch, self.max_residues_per_batch, self.num_shards
            )

    def train_batches(self, seed: int = 0):
        return self.batches("train", shuffle=True, seed=seed)

    def val_batches(self):
        return self.batches("valid")

    def test_batches(self):
        return self.batches("test")

    # --- prediction -------------------------------------------------------
    def predict_batches(self) -> Iterator[GraphBatch]:
        if not self.predict_input_dir or not os.path.isdir(
            self.predict_input_dir
        ):
            return
        names = sorted(
            f for f in os.listdir(self.predict_input_dir)
            if f.endswith(".pdb")
        )
        for name in names:
            decoy = os.path.join(self.predict_input_dir, name)
            native = (
                os.path.join(self.predict_true_dir, name)
                if self.predict_true_dir
                else None
            )
            g = featurize_decoy(
                decoy,
                native if native and os.path.exists(native) else None,
                esm_cache_dir=self.esm_cache_dir,
                edge_cutoff=self.edge_cutoff,
                max_neighbors=self.max_neighbors,
                rbf_edge_dist_cutoff=self.rbf_edge_dist_cutoff,
                num_rbf=self.num_rbf,
                lddt_exec_path=self.lddt_exec_path,
                subset_to_ca_atoms_only=self.subset_to_ca,
            )
            dense_degree, dense_out = self._dense_budgets()
            batch = next(
                batches_from_dataset(
                    [g], self._bucket(), num_shards=1, drop_last=False,
                    dense_degree=dense_degree, dense_out_degree=dense_out,
                )
            )
            batch = _globalize_residues(batch, self.max_residues_per_batch)
            self.predict_paths.append(decoy)
            yield batch

    def record_predictions(self, batch, preds, output_dir, decoy=None):
        """Write b-factor-annotated PDBs + CSV rows (reference
        gcpnet_eq_module.record_qa_preds, :476-534)."""
        from gcpnet_tpu.data.pdb import annotate_pdb_bfactor_column, parse_pdb

        if decoy is None and self.predict_paths:
            decoy = self.predict_paths.pop(0)
        rows = []
        res_mask = np.asarray(batch.extras["res_mask"]).astype(bool)
        preds = np.asarray(preds)[res_mask]
        if decoy:
            s = parse_pdb(decoy, heavy_only=True)
            rid_order = []
            seen = set()
            for a in s.atoms:
                rid = (a.chain, a.resseq, a.icode)
                if rid not in seen:
                    seen.add(rid)
                    rid_order.append(rid)
            values = {
                rid: float(preds[i])
                for i, rid in enumerate(rid_order)
                if i < preds.shape[0]
            }
            out_path = os.path.join(output_dir, os.path.basename(decoy))
            annotate_pdb_bfactor_column(decoy, out_path, values)
            labels = np.asarray(batch.extras["label"])[res_mask]
            rows.append(
                {
                    "decoy": os.path.basename(decoy),
                    "global_plddt_pred": float(preds.mean()),
                    "global_lddt_true": float(labels.mean()),
                    "annotated_pdb": out_path,
                }
            )
        return rows


def _globalize_residues(
    batch: GraphBatch, max_residues: int, num_shards: int = 1
) -> GraphBatch:
    """Convert per-graph residue indices to shard-global ones and pad the
    per-residue label/mask arrays to a static per-shard size (the reference
    converts on device, gcpnet_eq_module.py:178-183; we do it on host).

    With ``num_shards > 1`` (collate_shards layout: shard sub-batches
    concatenated along axis 0 with shard-local node/graph indices), residue
    indices are made *shard-local* and each shard's label/mask block is
    padded to ``max_residues`` — under ``shard_map`` with P('dp') every
    device then sees a self-contained [max_residues] slice."""
    res_idx = np.asarray(batch.extras["atom_residue_idx"]).copy()
    graph_id = np.asarray(batch.graph_id)
    node_mask = np.asarray(batch.node_pad_mask)
    labels = np.asarray(batch.extras["label"])
    res_masks = np.asarray(batch.extras["res_mask"])

    n_per_shard = res_idx.shape[0] // num_shards
    l_per_shard = labels.shape[0] // num_shards

    new_res_idx = np.zeros_like(res_idx)
    out_labels = []
    out_masks = []
    for s in range(num_shards):
        rows_s = slice(s * n_per_shard, (s + 1) * n_per_shard)
        gid = graph_id[rows_s]
        mask_s = node_mask[rows_s]
        ridx = res_idx[rows_s]
        lab_s = labels[s * l_per_shard : (s + 1) * l_per_shard]
        rm_s = res_masks[s * l_per_shard : (s + 1) * l_per_shard]

        # labels/res_mask were concatenated per graph by batch_graphs;
        # residue indices restart per graph — offset by the shard-local
        # running residue count.
        new_local = np.zeros_like(ridx)
        offset = 0
        label_ptr = 0
        shard_labels = []
        shard_masks = []
        for g in np.unique(gid[mask_s]):
            rows = mask_s & (gid == g)
            local = ridx[rows]
            n_res = int(local.max()) + 1 if rows.any() else 0
            new_local[rows] = local + offset
            shard_labels.append(lab_s[label_ptr : label_ptr + n_res])
            shard_masks.append(rm_s[label_ptr : label_ptr + n_res])
            label_ptr += n_res
            offset += n_res
        new_res_idx[rows_s] = new_local

        lab = np.concatenate(shard_labels) if shard_labels else np.zeros(0)
        msk = np.concatenate(shard_masks) if shard_masks else np.zeros(0)
        if lab.shape[0] > max_residues:
            raise ValueError(
                f"shard {s} holds {lab.shape[0]} residues > budget "
                f"{max_residues} (raise max_residues_per_batch)"
            )
        pad = max_residues - lab.shape[0]
        out_labels.append(np.pad(lab, (0, pad)).astype(np.float32))
        out_masks.append(np.pad(msk, (0, pad)).astype(np.float32))

    extras = dict(batch.extras)
    extras["atom_residue_idx"] = new_res_idx
    extras["label"] = np.concatenate(out_labels)
    extras["res_mask"] = np.concatenate(out_masks)
    return batch.replace(extras=extras)
