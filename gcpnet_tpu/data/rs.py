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

from gcpnet_tpu.data import batching
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


def mol_to_record(mol) -> dict:
    """Extract a plain-dict record from an RDKit conformer (the only
    rdkit-touching step).  Records are picklable without rdkit, enabling the
    offline conversion path (scripts/convert_rs_pickles.py)."""
    from rdkit import Chem

    conformer = mol.GetConformer()
    x = np.asarray(conformer.GetPositions(), dtype=np.float32)

    global_tags = dict(
        Chem.FindMolChiralCenters(
            mol, force=True, includeUnassigned=True,
            useLegacyImplementation=False,
        )
    )
    atoms = []
    for atom in mol.GetAtoms():
        atoms.append(
            dict(
                symbol=atom.GetSymbol(),
                degree=atom.GetTotalDegree(),
                charge=atom.GetFormalCharge(),
                num_hs=atom.GetTotalNumHs(),
                hybridization=str(atom.GetHybridization()),
                aromatic=bool(atom.GetIsAromatic()),
                mass=float(atom.GetMass()),
                global_tag=global_tags.get(atom.GetIdx()),
                chiral_tag=int(atom.GetChiralTag()),
            )
        )
    bonds = []
    for bond in mol.GetBonds():
        bonds.append(
            dict(
                i=bond.GetBeginAtomIdx(),
                j=bond.GetEndAtomIdx(),
                type=str(bond.GetBondType()),
                conjugated=bool(bond.GetIsConjugated()),
                in_ring=bool(bond.IsInRing()),
                stereo=int(bond.GetStereo()),
            )
        )
    return {"coords": x, "atoms": atoms, "bonds": bonds}


def record_to_graph(
    record: dict, d_max: float = 4.5, num_rbf: int = 16,
    stereo_mask: bool = True, label: Optional[float] = None,
) -> GraphData:
    """rdkit-free featurization from a :func:`mol_to_record` record."""
    x = np.asarray(record["coords"], dtype=np.float32)
    bonds = sorted(
        ((min(b["i"], b["j"]), max(b["i"], b["j"]), b) for b in record["bonds"])
    )
    senders_l, receivers_l, edge_feats = [], [], []
    for i, j, b in bonds:
        f = _one_hot(b["type"], BOND_TYPES)
        f += [float(b["conjugated"]), float(b["in_ring"])]
        f += _one_hot(int(b["stereo"]), list(range(6)))
        # interleave directions as the reference does: (u,v),(v,u) per bond
        senders_l += [i, j]
        receivers_l += [j, i]
        edge_feats += [f, f]
    senders = np.asarray(senders_l, dtype=np.int32)
    receivers = np.asarray(receivers_l, dtype=np.int32)
    bond_feats = np.asarray(edge_feats, dtype=np.float32).reshape(
        -1, EDGE_FEATURE_DIM
    )

    node_feats = []
    for atom in record["atoms"]:
        f = _one_hot(atom["symbol"], ATOM_TYPES_RS)
        f += _one_hot(atom["degree"], DEGREES)
        f += _one_hot(atom["charge"], FORMAL_CHARGES)
        f += _one_hot(atom["num_hs"], NUM_HS)
        f += _one_hot(atom["hybridization"], HYBRIDIZATIONS)
        f += [float(atom["aromatic"]), atom["mass"] * 0.01]
        tag = atom["global_tag"]
        gtag = 1 if tag == "R" else 2 if tag == "S" else -1 if tag else 0
        f += _one_hot(gtag, [0, 1, 2])
        f += _one_hot(int(atom["chiral_tag"]), [0, 1, 2, 3])
        node_feats.append(f)
    h = np.asarray(node_feats, dtype=np.float32)

    return _assemble_rs_graph(
        x, h, bond_feats, senders, receivers, d_max, num_rbf, stereo_mask,
        label,
    )


def rdkit_mol_to_graph(
    mol, d_max: float = 4.5, num_rbf: int = 16, stereo_mask: bool = True,
    label: Optional[float] = None,
) -> GraphData:
    """Faithful reference featurization; requires rdkit."""
    return record_to_graph(
        mol_to_record(mol), d_max=d_max, num_rbf=num_rbf,
        stereo_mask=stereo_mask, label=label,
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


# --- enantiomer-paired samplers (reference rs_dataset.py:224-332) ----------

class SampleMapToPositives:
    """index -> conformers of the SAME stereoisomer (equal ``ID``).

    The reference builds this over a +/-50-row window of the
    SMILES_nostereo-sorted dataframe (an optimization, exact for sorted
    data); here the mapping is computed exactly over the full column."""

    def __init__(self, ids: List, include_anchor: bool = False):
        by_id: dict = {}
        for i, mol_id in enumerate(ids):
            by_id.setdefault(mol_id, set()).add(i)
        self.mapping = {}
        for i, mol_id in enumerate(ids):
            group = by_id[mol_id] if include_anchor else by_id[mol_id] - {i}
            self.mapping[i] = group

    def sample(self, i, rng, N=1, without_replacement=True):
        pool = sorted(self.mapping[i])
        if not pool:
            return []
        if without_replacement:
            take = min(N, len(pool))
            return [int(j) for j in rng.choice(pool, take, replace=False)]
        return [int(rng.choice(pool)) for _ in range(N)]


class SampleMapToNegatives:
    """index -> conformers of OTHER stereoisomers of the same molecule
    (equal ``SMILES_nostereo``, different ``ID``), grouped per negative
    stereoisomer for stratified sampling."""

    def __init__(self, ids: List, smiles_nostereo: List):
        by_smiles: dict = {}
        for i, (mol_id, sm) in enumerate(zip(ids, smiles_nostereo)):
            by_smiles.setdefault(sm, {}).setdefault(mol_id, set()).add(i)
        self.mapping = {}
        for i, (mol_id, sm) in enumerate(zip(ids, smiles_nostereo)):
            self.mapping[i] = [
                sorted(members)
                for other, members in by_smiles[sm].items()
                if other != mol_id
            ]

    def sample(self, i, rng, N=1, without_replacement=True, stratified=True):
        classes = self.mapping[i]
        if not classes:
            return []
        if stratified:
            out = []
            for pool in classes:
                if without_replacement:
                    take = min(N, len(pool))
                    out += [int(j) for j in rng.choice(pool, take, replace=False)]
                else:
                    out += [int(rng.choice(pool)) for _ in range(N)]
            return out
        population = [j for pool in classes for j in pool]
        if without_replacement:
            take = min(N, len(population))
            return [int(j) for j in rng.choice(population, take, replace=False)]
        return [int(rng.choice(population)) for _ in range(N)]


class SingleConformerBatchSampler:
    """Anchor (one conformer per stereoisomer) + ``num_pos`` extra
    conformers of the same stereoisomer + ``num_neg`` conformers of each
    opposite stereoisomer per batch group (reference rs_dataset.py:284-316;
    the anchor is included via SampleMapToPositives(include_anchor=True))."""

    def __init__(
        self,
        single_conformer_indices: List[int],
        ids: List,
        smiles_nostereo: List,
        batch_size: int,
        num_pos: int = 0,
        num_neg: int = 1,
        seed: int = 0,
        without_replacement: bool = True,
        stratified: bool = True,
    ):
        self.anchors = list(single_conformer_indices)
        self.positive_sampler = SampleMapToPositives(ids, include_anchor=True)
        self.negative_sampler = SampleMapToNegatives(ids, smiles_nostereo)
        self.batch_size = batch_size
        self.num_pos = num_pos
        self.num_neg = num_neg
        self.seed = seed
        self.without_replacement = without_replacement
        self.stratified = stratified

    def __iter__(self):
        rng = np.random.default_rng(self.seed)
        groups = [
            [
                *self.positive_sampler.sample(
                    i, rng, N=1 + self.num_pos,
                    without_replacement=self.without_replacement,
                ),
                *self.negative_sampler.sample(
                    i, rng, N=self.num_neg,
                    without_replacement=self.without_replacement,
                    stratified=self.stratified,
                ),
            ]
            for i in self.anchors
        ]
        rng.shuffle(groups)
        for b in range(len(groups) // self.batch_size):
            chunk = groups[b * self.batch_size : (b + 1) * self.batch_size]
            yield [i for grp in chunk for i in grp]

    def __len__(self):
        return len(self.anchors) // self.batch_size


class NegativeBatchSampler:
    """Every conformer as anchor + ``num_neg`` stratified negatives
    (reference rs_dataset.py:319-332)."""

    def __init__(
        self,
        ids: List,
        smiles_nostereo: List,
        batch_size: int,
        num_neg: int = 1,
        seed: int = 0,
        without_replacement: bool = True,
        stratified: bool = True,
    ):
        self.n = len(ids)
        self.negative_sampler = SampleMapToNegatives(ids, smiles_nostereo)
        self.batch_size = batch_size
        self.num_neg = num_neg
        self.seed = seed
        self.without_replacement = without_replacement
        self.stratified = stratified

    def __iter__(self):
        rng = np.random.default_rng(self.seed)
        groups = [
            [
                i,
                *self.negative_sampler.sample(
                    i, rng, N=self.num_neg,
                    without_replacement=self.without_replacement,
                    stratified=self.stratified,
                ),
            ]
            for i in range(self.n)
        ]
        rng.shuffle(groups)
        for b in range(len(groups) // self.batch_size):
            chunk = groups[b * self.batch_size : (b + 1) * self.batch_size]
            yield [i for grp in chunk for i in grp]

    def __len__(self):
        return self.n // self.batch_size


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
        self.iteration_mode = iteration_mode
        self.sample_1_conformer = sample_1_conformer
        self.stereo_mask = stereo_mask
        self.mask_coordinates = mask_coordinates
        self.num_pos = num_pos
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
        self.meta: dict = {}

    def prepare_data(self):
        pass

    def _load_pickle_split(self, split: str) -> bool:
        """Load the reference's pickled dataframe format: columns ``ID``
        (stereoisomer id), ``SMILES_nostereo`` (stereo-stripped molecule
        key), ``RS_label_binary``, and either ``rdkit_mol_cistrans_stereo``
        (RDKit mols; needs rdkit) or ``record`` (rdkit-free dicts produced
        offline by scripts/convert_rs_pickles.py)."""
        path = self.paths.get(split)
        if not path or not os.path.exists(path):
            return False
        try:
            import pandas as pd

            df = pd.read_pickle(path)
        except Exception as exc:
            log.warning(f"cannot load {path} ({exc}); using synthetic RS data")
            return False
        graphs, labels, ids, smiles = [], [], [], []
        for _, row in df.iterrows():
            label = float(row["RS_label_binary"])
            try:
                if "record" in row and row["record"] is not None:
                    g = record_to_graph(
                        row["record"], d_max=self.d_max, num_rbf=self.num_rbf,
                        stereo_mask=self.stereo_mask, label=label,
                    )
                else:
                    g = rdkit_mol_to_graph(
                        row["rdkit_mol_cistrans_stereo"],
                        d_max=self.d_max, num_rbf=self.num_rbf,
                        stereo_mask=self.stereo_mask, label=label,
                    )
            except Exception as exc:
                log.warning(f"skipping RS row ({exc})")
                continue
            ids.append(row["ID"])
            smiles.append(row.get("SMILES_nostereo", row["ID"]))
            labels.append(label)
            graphs.append(g)
        self.graphs[split] = graphs
        self._set_meta(split, ids, smiles, np.asarray(labels))
        return True

    def _set_meta(self, split, ids, smiles, labels):
        seen = set()
        single_idx = []
        for i, mol_id in enumerate(ids):
            if mol_id not in seen:
                seen.add(mol_id)
                single_idx.append(i)
        self.meta[split] = {
            "ids": ids,
            "smiles": smiles,
            "labels": labels,
            "single_idx": single_idx,
        }

    def _make_synthetic_split(self, split: str):
        split_offset = {"train": 0, "valid": 1, "test": 2}.get(split, 3)
        rng = np.random.default_rng(self.seed + split_offset)
        n_pairs = self.synthetic_sizes[split] // 2
        graphs, labels, ids, smiles = [], [], [], []
        for p in range(n_pairs):
            g_r, g_s = synthetic_chiral_molecule(
                rng, stereo_mask=self.stereo_mask,
                d_max=self.d_max, num_rbf=self.num_rbf,
            )
            for g, tag in ((g_r, "R"), (g_s, "S")):
                ids.append(f"{split}-mol{p}-{tag}")
                smiles.append(f"{split}-mol{p}")
                labels.append(float(g.extras["label"]))
                graphs.append(g)
        self.graphs[split] = graphs
        self._set_meta(split, ids, smiles, np.asarray(labels))

    def setup(self, stage: Optional[str] = None):
        for split in ("train", "valid", "test"):
            if not self._load_pickle_split(split):
                self._make_synthetic_split(split)
        log.info(
            "RS splits: "
            + ", ".join(f"{k}={len(v)}" for k, v in self.graphs.items())
        )

    def _bucket(self) -> Bucket:
        # reference semantics: batch_size counts *anchors*; each group adds
        # 1 + num_pos positives and num_neg negatives per opposite
        # stereoisomer (rs_dataset.py:284-316)
        group = 1 + self.num_pos + self.num_neg
        n = self.max_nodes_per_graph * self.batch_size * group
        return Bucket(
            num_nodes=n, num_edges=2 * n,
            num_graphs=self.batch_size * group,
        )

    def batches(
        self, split: str, paired: bool = False, seed: int = 0
    ) -> Iterator[GraphBatch]:
        graphs = self.graphs[split]
        if paired:
            meta = self.meta[split]
            if self.iteration_mode == "conformers":
                sampler = NegativeBatchSampler(
                    meta["ids"], meta["smiles"], self.batch_size,
                    num_neg=self.num_neg, seed=seed,
                )
            else:  # "stereoisomers" (the RS experiments' mode)
                sampler = SingleConformerBatchSampler(
                    meta["single_idx"], meta["ids"], meta["smiles"],
                    self.batch_size, num_pos=self.num_pos,
                    num_neg=self.num_neg, seed=seed,
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
            # measured on v5e: plain scatter beats the sorted Pallas layout
            # (see data/batching.py SORT_EDGES_DEFAULT)
            sort_edges=batching.SORT_EDGES_DEFAULT,
        )

    def train_batches(self, seed: int = 0):
        return self.batches("train", paired=True, seed=seed)

    def val_batches(self):
        return self.batches("valid")

    def test_batches(self):
        return self.batches("test")
