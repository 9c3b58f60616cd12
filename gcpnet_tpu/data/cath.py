"""CATH 4.2 datamodule for CPD.

Re-design of ``CATHDataset``/``CATHDataModule``
(/root/reference/src/datamodules/components/cath_dataset.py,
cath_datamodule.py): jsonl chain-set records split by the official
chain_set_splits.json, with the ``short`` (test_split_L100.json) and
``single_chain`` (test_split_sc.json) custom test subsets exposed for CPD
metrics.  Download URLs match the reference's auto-download; in zero-egress
environments the files must be pre-staged (or a synthetic fixture used).
"""

from __future__ import annotations

import json
import os
import urllib.request
from typing import Dict, Iterator, List, Optional

import numpy as np

from gcpnet_tpu.data import batching
from gcpnet_tpu.data.batching import Bucket, batches_from_dataset
from gcpnet_tpu.data.protein_graph import featurize_protein
from gcpnet_tpu.graph import GraphBatch
from gcpnet_tpu.utils.pylogger import get_pylogger

log = get_pylogger(__name__)

CATH_URL = "http://people.csail.mit.edu/ingraham/graph-protein-design/data/cath/chain_set.jsonl"
SPLITS_URL = "http://people.csail.mit.edu/ingraham/graph-protein-design/data/cath/chain_set_splits.json"
SHORT_URL = "http://people.csail.mit.edu/ingraham/graph-protein-design/data/SPIN2/test_split_L100.json"
SC_URL = "http://people.csail.mit.edu/ingraham/graph-protein-design/data/SPIN2/test_split_sc.json"


class CATHDataModule:
    def __init__(
        self,
        data_dir: str = "data/CATH",
        file_name: str = "chain_set.jsonl",
        splits_file_name: str = "chain_set_splits.json",
        short_file_name: str = "test_split_L100.json",
        single_chain_file_name: str = "test_split_sc.json",
        max_neighbors: int = 32,
        max_units: int = 0,
        unit: str = "edge",
        batch_size: int = 8,
        features_cfg: Optional[Dict] = None,
        top_k: int = 30,
        num_rbf: int = 16,
        num_shards: int = 1,
        max_nodes_per_batch: int = 2048,
    ):
        self.data_dir = data_dir
        self.file_name = file_name
        self.splits_file_name = splits_file_name
        self.short_file_name = short_file_name
        self.single_chain_file_name = single_chain_file_name
        self.max_units = max_units
        self.unit = unit
        self.batch_size = batch_size
        self.features_cfg = features_cfg or {}
        self.top_k = int(self.features_cfg.get("top_k", top_k))
        self.num_rbf = num_rbf
        self.num_shards = num_shards
        self.max_nodes_per_batch = max_nodes_per_batch
        self.splits: Dict[str, List[dict]] = {}
        self.custom_splits: Dict[str, List[str]] = {}

    # ------------------------------------------------------------------
    def prepare_data(self):
        os.makedirs(self.data_dir, exist_ok=True)
        targets = [
            (self.file_name, CATH_URL),
            (self.splits_file_name, SPLITS_URL),
            (self.short_file_name, SHORT_URL),
            (self.single_chain_file_name, SC_URL),
        ]
        for fname, url in targets:
            path = os.path.join(self.data_dir, fname)
            if os.path.exists(path):
                continue
            try:
                log.info(f"downloading {url}")
                urllib.request.urlretrieve(url, path)
            except Exception as exc:
                log.warning(
                    f"could not download {fname} ({exc}); stage it manually "
                    f"under {self.data_dir}"
                )

    def setup(self, stage: Optional[str] = None):
        path = os.path.join(self.data_dir, self.file_name)
        splits_path = os.path.join(self.data_dir, self.splits_file_name)
        with open(splits_path) as f:
            split_ids = json.load(f)
        wanted = {
            name: set(ids)
            for name, ids in split_ids.items()
            if name in ("train", "validation", "test")
        }
        records: Dict[str, List[dict]] = {k: [] for k in wanted}
        with open(path) as f:
            for line in f:
                try:
                    entry = json.loads(line)
                except json.JSONDecodeError:
                    continue
                name = entry.get("name") or entry.get("id")
                # chain-set coords arrive keyed by atom name
                coords = entry.get("coords")
                if isinstance(coords, dict):
                    entry["coords"] = np.stack(
                        [
                            np.asarray(coords[a], dtype=np.float32)
                            for a in ("N", "CA", "C", "O")
                        ],
                        axis=1,
                    )
                for split, ids in wanted.items():
                    if name in ids:
                        records[split].append(entry)
        self.splits = {
            "train": records.get("train", []),
            "valid": records.get("validation", []),
            "test": records.get("test", []),
        }
        for key, fname in (
            ("short", self.short_file_name),
            ("single_chain", self.single_chain_file_name),
        ):
            p = os.path.join(self.data_dir, fname)
            if os.path.exists(p):
                with open(p) as f:
                    subset = json.load(f)
                self.custom_splits[key] = set(subset.get("test", subset))
        log.info(
            "CATH splits: "
            + ", ".join(f"{k}={len(v)}" for k, v in self.splits.items())
        )

    # ------------------------------------------------------------------
    def _graphs(self, split: str):
        for entry in self.splits[split]:
            try:
                g = featurize_protein(
                    entry,
                    features_cfg=self.features_cfg,
                    top_k=self.top_k,
                    num_rbf=self.num_rbf,
                )
            except (KeyError, ValueError):
                continue
            yield g

    def _bucket(self) -> Bucket:
        if self.max_units and self.max_units > 0:
            from gcpnet_tpu.data.batching import make_bucket

            return make_bucket(
                self.max_units, self.unit, self.batch_size,
                avg_degree=self.top_k,
            )
        n = self.max_nodes_per_batch
        return Bucket(
            num_nodes=n, num_edges=n * self.top_k, num_graphs=self.batch_size
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
            # measured on v5e: dense fixed-degree layout beats plain scatter
            # beats sorted Pallas (see data/batching.py DENSE_EDGES_DEFAULT);
            # the kNN featurizer caps in-degree at top_k
            sort_edges=batching.SORT_EDGES_DEFAULT,
            # node-budget mode only (see data/atom3d.py rationale)
            dense_degree=(
                self.top_k
                if batching.DENSE_EDGES_DEFAULT
                and not (self.max_units and self.max_units > 0)
                else None
            ),
            # kNN caps in-degree (top_k) but not out-degree; 2x is generous
            dense_out_degree=(
                2 * self.top_k
                if batching.DENSE_EDGES_DEFAULT
                and not (self.max_units and self.max_units > 0)
                else None
            ),
        )

    def named_graphs(self, split: str):
        """(name, GraphData) pairs for per-chain CPD evaluation
        (perplexity/recovery with short/single_chain subsets)."""
        for entry in self.splits[split]:
            name = entry.get("name") or entry.get("id") or ""
            try:
                g = featurize_protein(
                    entry,
                    features_cfg=self.features_cfg,
                    top_k=self.top_k,
                    num_rbf=self.num_rbf,
                )
            except (KeyError, ValueError):
                continue
            yield name, g

    def train_batches(self, seed: int = 0):
        return self.batches("train", shuffle=True, seed=seed)

    def val_batches(self):
        return self.batches("valid")

    def test_batches(self):
        return self.batches("test")
