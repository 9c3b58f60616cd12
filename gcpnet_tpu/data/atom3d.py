"""ATOM3D datamodule for LBA and PSR.

Re-design of ``ATOM3DDataModule`` + the LBA/PSR transforms
(/root/reference/src/datamodules/atom3d_datamodule.py,
src/datamodules/components/atom3d_dataset.py): atom DataFrames -> radius
graphs (r=4.5, max 32 neighbors) with 16 Gaussian RBF edge scalars, unit
edge vectors, 9-way atom-type node scalars and chain-orientation node
vectors.

Storage backends:
  1. the ``atom3d`` package's LMDB datasets when importable (the
     reference's path, with the same auto-download calls), or
  2. a pre-converted ``.npz`` record directory (``scripts/
     convert_atom3d_to_npz.py``) for environments without lmdb.
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional

import numpy as np

from gcpnet_tpu.data import batching
from gcpnet_tpu.data.batching import Bucket, batches_from_dataset
from gcpnet_tpu.data.features import (
    edge_geometric_features,
    orientations,
)
from gcpnet_tpu.graph import GraphBatch, GraphData
from gcpnet_tpu.utils.pylogger import get_pylogger

log = get_pylogger(__name__)

ATOM_TYPES = {"H": 0, "C": 1, "N": 2, "O": 3, "F": 4, "S": 5, "Cl": 6,
              "CL": 6, "P": 7}
NUM_ATOM_TYPES = 9  # 8 named + other


def element_to_type(elements) -> np.ndarray:
    return np.asarray(
        [ATOM_TYPES.get(str(e), 8) for e in elements], dtype=np.int32
    )


def radius_graph(
    coords: np.ndarray, r: float, max_num_neighbors: int = 32
):
    """torch_cluster.radius_graph semantics: for each center i, up to
    ``max_num_neighbors`` neighbors j with ||x_i - x_j|| <= r (self
    excluded); edges returned as (senders=j, receivers=i)."""
    try:
        from gcpnet_tpu.data.native import radius_graph_native

        return radius_graph_native(coords, r, max_num_neighbors)
    except Exception:
        pass
    from scipy.spatial import cKDTree

    tree = cKDTree(coords)
    senders, receivers = [], []
    # query k+1 because the query point itself is included
    k = min(max_num_neighbors + 1, coords.shape[0])
    dists, idx = tree.query(coords, k=k, distance_upper_bound=r)
    n = coords.shape[0]
    for i in range(n):
        nbrs = idx[i]
        ds = dists[i]
        valid = (nbrs != i) & np.isfinite(ds) & (nbrs < n)
        nbrs = nbrs[valid][:max_num_neighbors]
        senders.append(nbrs)
        receivers.append(np.full(len(nbrs), i, dtype=np.int64))
    return (
        np.concatenate(senders).astype(np.int32),
        np.concatenate(receivers).astype(np.int32),
    )


def featurize_atoms(
    coords: np.ndarray,
    elements,
    edge_cutoff: float = 4.5,
    num_rbf: int = 16,
    max_neighbors: int = 32,
) -> GraphData:
    """Shared LBA/PSR atom-graph featurization (atom3d_dataset.py:86-130)."""
    coords = np.asarray(coords, dtype=np.float32)
    senders, receivers = radius_graph(coords, edge_cutoff, max_neighbors)
    edge_s, edge_v = edge_geometric_features(
        coords, senders, receivers, d_max=edge_cutoff, num_rbf=num_rbf
    )
    node_s = element_to_type(elements)
    node_v = orientations(coords)
    return GraphData(
        h=node_s,
        chi=np.nan_to_num(node_v),
        e=edge_s,
        xi=edge_v,
        x=coords,
        senders=senders,
        receivers=receivers,
    )


class ATOM3DDataModule:
    """LBA (ligand binding affinity) and PSR (structure ranking)."""

    def __init__(
        self,
        task: str = "LBA",
        data_dir: str = "data/ATOM3D",
        lba_split: int = 30,
        edge_cutoff: float = 4.5,
        max_neighbors: int = 32,
        max_units: int = 0,
        unit: str = "edge",
        batch_size: int = 16,
        num_shards: int = 1,
        max_nodes_per_batch: int = 16384,
    ):
        self.task = task.upper()
        self.data_dir = data_dir
        self.lba_split = lba_split
        self.edge_cutoff = edge_cutoff
        self.max_neighbors = max_neighbors
        self.max_units = max_units
        self.unit = unit
        self.batch_size = batch_size
        self.num_shards = num_shards
        self.max_nodes_per_batch = max_nodes_per_batch
        self.datasets = {}
        self._target_codes = {}

    # --- storage ----------------------------------------------------------
    def _split_dir(self, split: str) -> str:
        names = {
            "LBA": f"LBA/split-by-sequence-identity-{self.lba_split}/data",
            "PSR": "PSR/split-by-year/data",
        }
        return os.path.join(self.data_dir, names[self.task], split)

    def prepare_data(self):
        """Download via the atom3d package when available (the reference's
        auto-download, atom3d_datamodule.py:139-149)."""
        try:
            from atom3d.datasets import download_dataset  # type: ignore
        except ImportError:
            log.warning(
                "atom3d package not importable; expecting pre-staged LMDB "
                f"or npz records under {self.data_dir}"
            )
            return
        for split in ("train", "val", "test"):
            path = self._split_dir(split)
            if not os.path.exists(path):
                os.makedirs(os.path.dirname(path), exist_ok=True)
                split_arg = (
                    f"sequence-identity-{self.lba_split}"
                    if self.task == "LBA"
                    else "year"
                )
                download_dataset(
                    self.task.lower(),
                    split=split_arg,
                    out_path=os.path.dirname(path),
                )

    def _load_split(self, split: str) -> List[dict]:
        """Returns raw records: LMDB via atom3d, else .npz directory."""
        path = self._split_dir(split)
        npz_dir = path + "_npz"
        if os.path.isdir(npz_dir):
            records = []
            for fname in sorted(os.listdir(npz_dir)):
                if fname.endswith(".npz"):
                    records.append(dict(np.load(os.path.join(npz_dir, fname),
                                                allow_pickle=True)))
            return records
        try:
            from atom3d.datasets import LMDBDataset  # type: ignore

            ds = LMDBDataset(path)
            return [ds[i] for i in range(len(ds))]
        except ImportError as exc:
            raise RuntimeError(
                f"no npz records at {npz_dir} and atom3d/lmdb unavailable: "
                f"{exc}.  Convert once with scripts/convert_atom3d_to_npz.py"
            )

    def setup(self, stage: Optional[str] = None):
        for split in ("train", "val", "test"):
            self.datasets[split] = self._load_split(split)
        log.info(
            f"{self.task} splits: "
            + ", ".join(f"{k}={len(v)}" for k, v in self.datasets.items())
        )

    # --- featurization ----------------------------------------------------
    def _featurize(self, elem: dict) -> Optional[GraphData]:
        if self.task == "LBA":
            return self._featurize_lba(elem)
        return self._featurize_psr(elem)

    def _featurize_lba(self, elem: dict) -> Optional[GraphData]:
        """Pocket + ligand concat with a ligand flag (atom3d_dataset.py:134-149)."""
        if "coords" in elem:  # npz record
            g = featurize_atoms(
                elem["coords"], elem["elements"],
                self.edge_cutoff, max_neighbors=self.max_neighbors,
            )
            lig_flag = np.asarray(elem["lig_flag"], dtype=np.int32)
            label = np.float32(elem["label"])
        else:  # atom3d LMDB record
            import pandas as pd

            pocket, ligand = elem["atoms_pocket"], elem["atoms_ligand"]
            df = pd.concat([pocket, ligand], ignore_index=True)
            coords = df[["x", "y", "z"]].to_numpy(dtype=np.float32)
            g = featurize_atoms(
                coords, df["element"].tolist(),
                self.edge_cutoff, max_neighbors=self.max_neighbors,
            )
            lig_flag = np.zeros(df.shape[0], dtype=np.int32)
            lig_flag[-len(ligand):] = 1
            label = np.float32(elem["scores"]["neglog_aff"])
        g.extras["lig_flag"] = lig_flag
        g.extras["label"] = label
        return g

    def _featurize_psr(self, elem: dict) -> Optional[GraphData]:
        """Hydrogen-stripped decoy graphs labeled with GDT-TS
        (atom3d_dataset.py:152-163)."""
        if "coords" in elem:  # npz record
            coords, elements = elem["coords"], elem["elements"]
            label = np.float32(elem["label"])
            target = str(elem.get("target", ""))
        else:
            df = elem["atoms"]
            df = df[df.element != "H"].reset_index(drop=True)
            coords = df[["x", "y", "z"]].to_numpy(dtype=np.float32)
            elements = df["element"].tolist()
            label = np.float32(elem["scores"]["gdt_ts"])
            target = str(eval(elem["id"])[0]) if "id" in elem else ""
        mask = np.asarray([str(e) != "H" for e in elements])
        coords = np.asarray(coords, dtype=np.float32)[mask]
        elements = [e for e, m in zip(elements, mask) if m]
        g = featurize_atoms(
            coords, elements, self.edge_cutoff,
            max_neighbors=self.max_neighbors,
        )
        g.extras["label"] = label
        code = self._target_codes.setdefault(target, len(self._target_codes))
        g.extras["target_id"] = np.int32(code)
        return g

    # --- iteration --------------------------------------------------------
    def _graphs(self, split: str):
        for elem in self.datasets[split]:
            try:
                g = self._featurize(elem)
            except (KeyError, ValueError) as exc:
                log.warning(f"skipping malformed record: {exc}")
                continue
            if g is not None:
                yield g

    def _bucket(self) -> Bucket:
        if self.max_units and self.max_units > 0:
            # reference edge-budget BatchSampler mode (max_units > 0,
            # atom3d_datamodule.py:183-209): the padded bucket is derived
            # from the unit budget
            from gcpnet_tpu.data.batching import make_bucket

            return make_bucket(
                self.max_units, self.unit, self.batch_size,
                avg_degree=self.max_neighbors,
            )
        n = self.max_nodes_per_batch
        return Bucket(
            num_nodes=n,
            num_edges=n * self.max_neighbors,
            num_graphs=self.batch_size,
        )

    def batches(
        self, split: str, shuffle: bool = False, seed: int = 0
    ) -> Iterator[GraphBatch]:
        return batches_from_dataset(
            self._graphs(split),
            self._bucket(),
            num_shards=self.num_shards,
            shuffle_seed=seed if shuffle else None,
            drop_last=shuffle,
            extra_graph_keys=("label", "target_id"),
            # measured on v5e: dense fixed-degree layout (195 ms/step) >
            # plain scatter (207) > sorted Pallas (386); the radius-graph
            # featurizer caps in-degree at max_neighbors, guaranteeing the
            # dense contract (see data/batching.py DENSE_EDGES_DEFAULT)
            sort_edges=batching.SORT_EDGES_DEFAULT,
            # node-budget mode only: there the list layout pads edges to
            # num_nodes*max_neighbors anyway, so dense costs nothing extra;
            # in edge-budget mode (max_units > 0) the make_bucket node slack
            # would inflate dense edge rows ~1.5x — keep the list layout
            dense_degree=(
                self.max_neighbors
                if batching.DENSE_EDGES_DEFAULT
                and not (self.max_units and self.max_units > 0)
                else None
            ),
            # sender-dense slot budget for the scatter-free gather backward:
            # the radius graph caps in-degree (max_neighbors) but not
            # out-degree; 2x the cap is a generous bound (near-symmetric
            # neighborhoods) — build_sender_perm raises if exceeded
            dense_out_degree=(
                2 * self.max_neighbors
                if batching.DENSE_EDGES_DEFAULT
                and not (self.max_units and self.max_units > 0)
                else None
            ),
        )

    def train_batches(self, seed: int = 0):
        return self.batches("train", shuffle=True, seed=seed)

    def val_batches(self):
        return self.batches("val")

    def test_batches(self):
        return self.batches("test")
