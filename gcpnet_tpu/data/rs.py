"""RS datamodule: R/S enantiomer chirality classification.

Re-design of ``rs_dataset.py``/``RSDataModule``
(/root/reference/src/datamodules/components/rs_dataset.py,
rs_datamodule.py): RDKit conformers -> covalent-bond graphs with 52-dim
chemistry node scalars (atom/degree/charge/numH/hybridization one-hots,
aromaticity, mass, global+local chiral tags), 30-dim edge scalars (14 bond
features + RBF16), orientation node vectors and unit edge vectors.  The
``stereo_mask`` zeroes the chiral-tag columns (h[:, -9:]) and bond-stereo
columns so the model must infer chirality from geometry; training batches
pair each anchor with ``num_neg`` opposite enantiomers
(SingleConformerBatchSampler, :224-332).

RDKit is optional: when it (or the reference's pickled dataframes) is
unavailable, a synthetic tetrahedral-center generator provides a
geometrically faithful chirality task with the same feature schema, so the
SE(3)-vs-E(3) probe remains trainable end-to-end.
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional

import numpy as np

from gcpnet_tpu.data.batching import Bucket, batches_from_dataset
from gcpnet_tpu.data.features import normalize, orientations, rbf
from gcpnet_tpu.graph import GraphBatch, GraphData
from gcpnet_tpu.utils.pylogger import get_pylogger

log = get_pylogger(__name__)

ATOM_TYPES_RS = ["H", "B", "C", "N", "O", "F", "Si", "P", "S", "Cl", "Br", "I"]
DEGREES = [0, 1, 2, 3, 4, 5, 6]
FORMAL_CHARGES = [-2, -1, 0, 1, 2]
NUM_HS = [0, 1, 2, 3, 4]
HYBRIDIZATIONS = ["S", "SP", "SP2", "SP3", "SP3D", "SP3D2", "UNSPECIFIED"]
BOND_TYPES = ["SINGLE", "DOUBLE", "TRIPLE", "AROMATIC"]

NODE_FEATURE_DIM = 52
EDGE_FEATURE_DIM = 14


def _one_hot(value, options) -> List[float]:
    out = [0.0] * (len(options) + 1)
    idx = options.index(value) if value in options else -1
    out[idx] = 1.0
    return out


def rdkit_mol_to_graph(
    mol, d_max: float = 4.5, num_rbf: int = 16, stereo_mask: bool = True,
    label: Optional[float] = None,
) -> GraphData:
    """Faithful reference featurization; requires rdkit."""
    import rdkit
    from rdkit import Chem

    conformer = mol.GetConformer()
    x = np.asarray(conformer.GetPositions(), dtype=np.float32)

    adj = Chem.GetAdjacencyMatrix(mol)
    ij = np.array(np.nonzero(np.triu(adj)), dtype=int)
    senders = np.concatenate([ij[0], ij[1]]).astype(np.int32)
    receivers = np.concatenate([ij[1], ij[0]]).astype(np.int32)
    # interleave directions as the reference does: (u,v),(v,u) per bond
    order = np.argsort(np.repeat(np.arange(ij.shape[1]), 2), kind="stable")
    inter = np.empty(senders.shape[0], dtype=np.int64)
    inter[0::2] = np.arange(ij.shape[1])
    inter[1::2] = np.arange(ij.shape[1]) + ij.shape[1]
    senders, receivers = senders[inter], receivers[inter]

    global_tags = dict(
        Chem.FindMolChiralCenters(
            mol, force=True, includeUnassigned=True,
            useLegacyImplementation=False,
        )
    )
    node_feats = []
    for atom in mol.GetAtoms():
        f = _one_hot(atom.GetSymbol(), ATOM_TYPES_RS)
        f += _one_hot(atom.GetTotalDegree(), DEGREES)
        f += _one_hot(atom.GetFormalCharge(), FORMAL_CHARGES)
        f += _one_hot(atom.GetTotalNumHs(), NUM_HS)
        f += _one_hot(str(atom.GetHybridization()), HYBRIDIZATIONS)
        f += [float(atom.GetIsAromatic()), atom.GetMass() * 0.01]
        tag = global_tags.get(atom.GetIdx())
        gtag = 1 if tag == "R" else 2 if tag == "S" else -1 if tag else 0
        f += _one_hot(gtag, [0, 1, 2])
        local = int(atom.GetChiralTag())
        f += _one_hot(local, [0, 1, 2, 3])
        node_feats.append(f)
    h = np.asarray(node_feats, dtype=np.float32)

    edge_feats = []
    for e in range(0, senders.shape[0], 2):
        bond = mol.GetBondBetweenAtoms(int(senders[e]), int(receivers[e]))
        f = _one_hot(str(bond.GetBondType()), BOND_TYPES)
        f += [float(bond.GetIsConjugated()), float(bond.IsInRing())]
        f += _one_hot(int(bond.GetStereo()), list(range(6)))
        edge_feats.append(f)
        edge_feats.append(f)
    bond_feats = np.asarray(edge_feats, dtype=np.float32)

    return _assemble_rs_graph(
        x, h, bond_feats, senders, receivers, d_max, num_rbf, stereo_mask,
        label,
    )


def _assemble_rs_graph(
    x, h, bond_feats, senders, receivers, d_max, num_rbf, stereo_mask, label
) -> GraphData:
    e_vec = x[senders] - x[receivers]
    e_rbf = rbf(np.linalg.norm(e_vec, axis=-1), d_max=d_max, d_count=num_rbf)
    e = np.concatenate([bond_feats, e_rbf], axis=-1).astype(np.float32)
    if stereo_mask:
        h = h.copy()
        e = e.copy()
        h[:, -9:] = 0.0  # global + local chiral tag one-hots
        e[:, (-7 - num_rbf) : -num_rbf] = 0.0  # bond stereo one-hot
    chi = np.nan_to_num(orientations(x))
    xi = np.nan_to_num(normalize(e_vec)[:, None, :])
    mask = np.isfinite(x.sum(-1))
    extras = {}
    if label is not None:
        extras["label"] = np.float32(label)
    return GraphData(
        h=np.nan_to_num(h),
        chi=chi.astype(np.float32),
        e=np.nan_to_num(e),
        xi=xi.astype(np.float32),
        x=np.nan_to_num(x),
        senders=senders,
        receivers=receivers,
        node_mask=mask,
        extras=extras,
    )


# --- synthetic chirality task (no-rdkit fallback) --------------------------

def synthetic_chiral_molecule(
    rng: np.random.Generator,
    stereo_mask: bool = True,
    d_max: float = 4.5,
    num_rbf: int = 16,
):
    """A tetrahedral stereocenter with four distinguishable substituent
    chains.  The R/S label is the sign of the signed volume of the three
    highest-priority substituents viewed from the center — the same
    geometric fact the masked reference task asks the model to recover.
    Returns an enantiomer PAIR (R and S versions, mirrored through x)."""
    # center atom at origin; 4 substituents in tetrahedral directions
    dirs = np.asarray(
        [[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]], dtype=np.float32
    ) / np.sqrt(3.0)
    # random rotation
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    dirs = dirs @ q.T

    # chains of distinct lengths 1..4 atoms => distinct "priorities"
    coords = [np.zeros(3, np.float32)]
    types = [2]  # center: carbon
    bonds = []
    chain_lengths = rng.permutation([1, 2, 3, 4])
    first_atoms = []
    for ci, (dvec, clen) in enumerate(zip(dirs, chain_lengths)):
        prev = 0
        for a in range(clen):
            pos = (
                coords[prev]
                + dvec * 1.5
                + rng.normal(scale=0.08, size=3).astype(np.float32)
            )
            coords.append(pos.astype(np.float32))
            types.append(int(3 + (ci % 4)))  # distinct element per branch
            bonds.append((prev, len(coords) - 1))
            if a == 0:
                first_atoms.append(len(coords) - 1)
            prev = len(coords) - 1
    coords = np.stack(coords)

    # signed volume of the three longest-chain substituent directions
    pr = np.argsort(-chain_lengths)  # priority by chain length
    v = [coords[first_atoms[p]] for p in pr[:3]]
    chirality = np.sign(np.dot(np.cross(v[0], v[1]), v[2]))

    def build(c3d, label):
        n = c3d.shape[0]
        h = np.zeros((n, NODE_FEATURE_DIM), np.float32)
        for i, t in enumerate(types):
            h[i, t % 13] = 1.0  # atom-type block
            h[i, 13 + min(4, 3)] = 1.0  # degree block (approx)
            h[i, 43] = 0.12  # mass placeholder
        s = np.asarray([b[0] for b in bonds] + [b[1] for b in bonds],
                       np.int32)
        r = np.asarray([b[1] for b in bonds] + [b[0] for b in bonds],
                       np.int32)
        bond_feats = np.zeros((s.shape[0], EDGE_FEATURE_DIM), np.float32)
        bond_feats[:, 0] = 1.0  # single bonds
        return _assemble_rs_graph(
            c3d.astype(np.float32), h, bond_feats, s, r, d_max, num_rbf,
            stereo_mask, float(label),
        )

    label_r = 1.0 if chirality > 0 else 0.0
    mirrored = coords.copy()
    mirrored[:, 0] = -mirrored[:, 0]
    return build(coords, label_r), build(mirrored, 1.0 - label_r)


# --- enantiomer-paired samplers -------------------------------------------

class SingleConformerBatchSampler:
    """Pairs each anchor molecule with ``num_neg`` opposite enantiomers
    (reference rs_dataset.py:224-332, simplified to the stereoisomer
    iteration mode the RS experiments use)."""

    def __init__(
        self,
        groups: List[List[int]],
        labels: np.ndarray,
        batch_size: int,
        num_neg: int = 1,
        seed: int = 0,
        without_replacement: bool = True,
    ):
        self.groups = groups  # indices grouped by SMILES_nostereo
        self.labels = labels
        self.batch_size = batch_size
        self.num_neg = num_neg
        self.seed = seed
        self.without_replacement = without_replacement

    def __iter__(self):
        rng = np.random.default_rng(self.seed)
        order = rng.permutation(len(self.groups))
        batch: List[int] = []
        for gi in order:
            group = self.groups[gi]
            if not group:
                continue
            anchor = int(rng.choice(group))
            batch.append(anchor)
            negs = [
                i for i in group if self.labels[i] != self.labels[anchor]
            ]
            if negs:
                take = min(self.num_neg, len(negs))
                batch.extend(
                    int(i)
                    for i in rng.choice(negs, size=take, replace=False)
                )
            if len(batch) >= self.batch_size:
                yield batch[: self.batch_size]
                batch = []
        if batch:
            yield batch


class RSDataModule:
    def __init__(
        self,
        train_data_filepath: Optional[str] = None,
        val_data_filepath: Optional[str] = None,
        test_data_filepath: Optional[str] = None,
        seed: int = 42,
        iteration_mode: str = "stereoisomers",
        sample_1_conformer: bool = False,
        mask_coordinates: bool = False,
        stereo_mask: bool = True,
        num_pos: int = 0,
        num_neg: int = 1,
        d_max: float = 4.5,
        num_rbf: int = 16,
        batch_size: int = 64,
        num_shards: int = 1,
        synthetic_sizes: Optional[dict] = None,
        max_nodes_per_graph: int = 64,
    ):
        self.paths = {
            "train": train_data_filepath,
            "valid": val_data_filepath,
            "test": test_data_filepath,
        }
        self.seed = seed
        self.stereo_mask = stereo_mask
        self.mask_coordinates = mask_coordinates
        self.num_neg = num_neg
        self.d_max = d_max
        self.num_rbf = num_rbf
        self.batch_size = batch_size
        self.num_shards = num_shards
        self.synthetic_sizes = synthetic_sizes or {
            "train": 4096, "valid": 512, "test": 512,
        }
        self.max_nodes_per_graph = max_nodes_per_graph
        self.graphs: dict = {}
        self.groups: dict = {}

    def prepare_data(self):
        pass

    def _load_pickle_split(self, split: str) -> bool:
        path = self.paths.get(split)
        if not path or not os.path.exists(path):
            return False
        try:
            import pandas as pd

            df = pd.read_pickle(path)
        except Exception as exc:
            log.warning(f"cannot load {path} ({exc}); using synthetic RS data")
            return False
        graphs, labels, groups = [], [], {}
        for _, row in df.iterrows():
            try:
                g = rdkit_mol_to_graph(
                    row["rdkit_mol_cistrans_stereo"],
                    d_max=self.d_max,
                    num_rbf=self.num_rbf,
                    stereo_mask=self.stereo_mask,
                    label=float(row["RS_label_binary"]),
                )
            except Exception:
                continue
            groups.setdefault(row.get("SMILES_nostereo", len(graphs)), []).append(
                len(graphs)
            )
            labels.append(float(row["RS_label_binary"]))
            graphs.append(g)
        self.graphs[split] = graphs
        self.groups[split] = (list(groups.values()), np.asarray(labels))
        return True

    def _make_synthetic_split(self, split: str):
        split_offset = {"train": 0, "valid": 1, "test": 2}.get(split, 3)
        rng = np.random.default_rng(self.seed + split_offset)
        n_pairs = self.synthetic_sizes[split] // 2
        graphs, labels, groups = [], [], []
        for _ in range(n_pairs):
            g_r, g_s = synthetic_chiral_molecule(
                rng, stereo_mask=self.stereo_mask,
                d_max=self.d_max, num_rbf=self.num_rbf,
            )
            groups.append([len(graphs), len(graphs) + 1])
            labels += [float(g_r.extras["label"]), float(g_s.extras["label"])]
            graphs += [g_r, g_s]
        self.graphs[split] = graphs
        self.groups[split] = (groups, np.asarray(labels))

    def setup(self, stage: Optional[str] = None):
        for split in ("train", "valid", "test"):
            if not self._load_pickle_split(split):
                self._make_synthetic_split(split)
        log.info(
            "RS splits: "
            + ", ".join(f"{k}={len(v)}" for k, v in self.graphs.items())
        )

    def _bucket(self) -> Bucket:
        n = self.max_nodes_per_graph * self.batch_size
        return Bucket(
            num_nodes=n, num_edges=2 * n, num_graphs=self.batch_size
        )

    def batches(
        self, split: str, paired: bool = False, seed: int = 0
    ) -> Iterator[GraphBatch]:
        graphs = self.graphs[split]
        if paired:
            groups, labels = self.groups[split]
            sampler = SingleConformerBatchSampler(
                groups, labels, self.batch_size, num_neg=self.num_neg,
                seed=seed,
            )
            def ordered():
                for batch_idx in sampler:
                    for i in batch_idx:
                        yield graphs[i]
            it = ordered()
        else:
            it = iter(graphs)
        return batches_from_dataset(
            it,
            self._bucket(),
            num_shards=self.num_shards,
            drop_last=paired,
            extra_graph_keys=("label",),
            sort_edges=True,
        )

    def train_batches(self, seed: int = 0):
        return self.batches("train", paired=True, seed=seed)

    def val_batches(self):
        return self.batches("valid")

    def test_batches(self):
        return self.batches("test")
