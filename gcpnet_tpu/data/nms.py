"""NMS datamodule: Newtonian many-body trajectories -> padded graph batches.

Re-design of ``NMSDataset``/``NMSDataModule``
(/root/reference/src/datamodules/components/nms_dataset.py,
nms_datamodule.py): data is generated locally by the vectorized simulator
(gcpnet_tpu.data.nms_sim) with the reference's physics and featurized
wholesale with numpy: node scalar ``‖v‖``, node vectors ``[v, forward,
backward]``, edge scalars ``[q_i q_j, RBF16(d)]``, edge vectors unit r_ij,
over fully-connected graphs; the model learns frame 30 -> frame 40
positions.

NMS graphs are fixed-size, so batches are exactly rectangular: a batch of
``B`` graphs has static shapes ``(B*n, B*n*(n-1))`` with no padding waste.
"""

from __future__ import annotations

import os
from typing import Iterator, Literal, Optional

import numpy as np

from gcpnet_tpu.data.features import normalize, orientations, rbf
from gcpnet_tpu.data.nms_sim import Mode, generate_split
from gcpnet_tpu.graph import GraphBatch


def _fc_edges(n: int):
    """Ordered fully-connected pairs (i != j), reference row-major order."""
    senders, receivers = [], []
    for i in range(n):
        for j in range(n):
            if i != j:
                senders.append(i)
                receivers.append(j)
    return np.asarray(senders, np.int32), np.asarray(receivers, np.int32)


class NMSDataModule:
    """Generates (or loads cached) NMS splits and yields GraphBatch'es."""

    SPLIT_SEEDS = {"train": 42, "valid": 43, "test": 44}
    SPLIT_SIZES = {"train": 10000, "valid": 2000, "test": 2000}

    def __init__(
        self,
        data_root: str = "data/NMS",
        data_mode: Mode = "small",
        batch_size: int = 100,
        frame_0: int = 30,
        frame_T: int = 40,
        rbf_edge_dist_cutoff: float = 4.5,
        num_rbf: int = 16,
        num_train: Optional[int] = None,
        num_valid: Optional[int] = None,
        num_test: Optional[int] = None,
        num_shards: int = 1,
    ):
        # device-sharded batches use shard-local edge indices (see
        # gcpnet_tpu.data.batching); batch_size must divide num_shards
        if batch_size % num_shards:
            raise ValueError("batch_size must be divisible by num_shards")
        self.num_shards = num_shards
        self.data_root = data_root
        self.data_mode = data_mode
        self.batch_size = batch_size
        self.frame_0, self.frame_T = frame_0, frame_T
        self.d_max, self.num_rbf = rbf_edge_dist_cutoff, num_rbf
        self.sizes = dict(self.SPLIT_SIZES)
        if num_train:
            self.sizes["train"] = num_train
        if num_valid:
            self.sizes["valid"] = num_valid
        if num_test:
            self.sizes["test"] = num_test
        self.splits = {}
        self._sender_perm_cache = {}

    # --- data preparation -------------------------------------------------
    def _cache_path(self, split: str) -> str:
        n = self.sizes[split]
        return os.path.join(
            self.data_root, f"nms_{self.data_mode}_{split}_{n}.npz"
        )

    def prepare_data(self):
        os.makedirs(self.data_root, exist_ok=True)
        for split, size in self.sizes.items():
            path = self._cache_path(split)
            if os.path.exists(path):
                continue
            loc, vel, edges, charges = generate_split(
                self.data_mode, size, seed=self.SPLIT_SEEDS[split]
            )
            np.savez_compressed(
                path, loc=loc, vel=vel, edges=edges, charges=charges
            )

    def setup(self):
        for split in self.sizes:
            with np.load(self._cache_path(split)) as z:
                self.splits[split] = self._precompute_features(
                    z["loc"], z["vel"], z["edges"]
                )

    @property
    def num_nodes_per_graph(self) -> int:
        return self.splits["train"]["x"].shape[1]

    # --- featurization ----------------------------------------------------
    def _precompute_features(self, loc, vel, qq):
        """Featurize a whole split at once (the dataset is static, so host
        work per training batch collapses to indexing + reshape)."""
        loc0 = loc[:, self.frame_0].astype(np.float32)  # [S, n, 3]
        locT = loc[:, self.frame_T].astype(np.float32)
        vel0 = vel[:, self.frame_0].astype(np.float32)

        S, n, _ = loc0.shape
        s, r = _fc_edges(n)

        h = np.linalg.norm(vel0, axis=-1, keepdims=True).astype(np.float32)
        fwd = normalize(loc0[:, 1:] - loc0[:, :-1])
        bwd = normalize(loc0[:, :-1] - loc0[:, 1:])
        zeros = np.zeros((S, 1, 3), np.float32)
        fwd = np.concatenate([fwd, zeros], axis=1)
        bwd = np.concatenate([zeros, bwd], axis=1)
        orient = np.stack([fwd, bwd], axis=2)
        chi = np.concatenate([vel0[:, :, None, :], orient], axis=2).astype(
            np.float32
        )

        vec = loc0[:, s] - loc0[:, r]
        dist = np.linalg.norm(vec, axis=-1)
        e_rbf = rbf(dist, d_max=self.d_max, d_count=self.num_rbf)
        qq_e = qq[:, s, r][..., None].astype(np.float32)
        e_s = np.nan_to_num(
            np.concatenate([qq_e, e_rbf], axis=-1).astype(np.float32)
        )
        e_v = np.nan_to_num(normalize(vec)[:, :, None, :].astype(np.float32))

        # re-order the fully-connected edge template SLOT-MAJOR by receiver:
        # template edge k*n + i is receiver i's k-th incoming edge (in-degree
        # is exactly n-1 for every node), so batches carry the DENSE
        # fixed-degree layout (edge_dense_degree = n-1) — receiver-side
        # aggregations run as [K, N, C] axis-0 sums instead of XLA scatters
        # on TPU (see data.batching.densify_edges_by_receiver)
        order = np.argsort(r, kind="stable")  # receiver-major [n, n-1]
        order = order.reshape(n, n - 1).T.reshape(-1)  # -> slot-major
        s, r = s[order], r[order]
        e_s = e_s[:, order]
        e_v = e_v[:, order]

        return {
            "h": h, "chi": chi, "e": e_s, "xi": e_v,
            "x": loc0, "label": locT, "senders": s, "receivers": r,
        }

    def _featurize(self, split: str, idx: np.ndarray) -> GraphBatch:
        """Assemble one rectangular GraphBatch by indexing the precomputed
        per-sample feature tensors."""
        d = self.splits[split]
        B = idx.shape[0]
        n = d["x"].shape[1]
        s, r = d["senders"], d["receivers"]
        e_per = s.shape[0]

        # flatten graphs into one batch with shard-local offsets: graph g's
        # nodes live at (g % graphs_per_shard) * n within its shard, so each
        # dp shard is self-contained under shard_map
        gps = B // self.num_shards  # graphs per shard
        local_graph = (np.arange(B, dtype=np.int32) % gps)
        offsets = (local_graph * n)[:, None]
        K = n - 1

        def slot_major(arr_be):
            """[B, e_per, ...] (template slot-major within each graph) ->
            flat per-shard SLOT-MAJOR edge rows: shard s's edge row
            k*N_shard + (g_local*n + i) is node (g_local*n + i)'s k-th
            incoming edge — the GraphBatch dense-layout contract."""
            a = arr_be.reshape(
                (self.num_shards, gps, K, n) + arr_be.shape[2:]
            )
            a = np.swapaxes(a, 1, 2)  # [S, K, gps, n, ...]
            return np.ascontiguousarray(a).reshape(
                (B * e_per,) + arr_be.shape[2:]
            )

        senders = slot_major(s[None, :] + offsets)
        receivers = slot_major(r[None, :] + offsets)
        graph_id = np.repeat(local_graph, n)

        N, E = B * n, B * e_per

        # sender-dense perm (scatter-free gather backward): fully-connected
        # graphs have out-degree exactly K; the shard-local layout is
        # identical across shards, so build one shard's perm and tile it
        key = (self.num_shards, gps, n)
        perm = self._sender_perm_cache.get(key)
        if perm is None:
            from gcpnet_tpu.data.batching import build_sender_perm

            n_shard_e = gps * e_per
            shard_perm = build_sender_perm(
                senders[:n_shard_e].astype(np.int32),
                np.ones(n_shard_e, bool),
                gps * n,
                K,
            )
            perm = np.tile(shard_perm, self.num_shards)
            self._sender_perm_cache[key] = perm
        return GraphBatch(
            h=d["h"][idx].reshape(N, 1),
            chi=d["chi"][idx].reshape(N, 3, 3),
            e=slot_major(d["e"][idx]).reshape(E, 1 + self.num_rbf),
            xi=slot_major(d["xi"][idx]).reshape(E, 1, 3),
            x=d["x"][idx].reshape(N, 3),
            senders=senders.astype(np.int32),
            receivers=receivers.astype(np.int32),
            graph_id=graph_id,
            node_pad_mask=np.ones(N, bool),
            edge_pad_mask=np.ones(E, bool),
            graph_pad_mask=np.ones(B, bool),
            node_mask=None,
            extras={"label": d["label"][idx].reshape(N, 3)},
            # the slot-major fully-connected template is exactly dense
            edge_dense_degree=K,
            sender_perm=perm,
            sender_out_degree=K,
        )

    # --- iteration --------------------------------------------------------
    def num_batches(self, split: str) -> int:
        return self.sizes[split] // self.batch_size

    def batches(
        self, split: str, shuffle: bool = False, seed: int = 0
    ) -> Iterator[GraphBatch]:
        size = self.sizes[split]
        order = np.arange(size)
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        bs = self.batch_size
        for start in range(0, size - bs + 1, bs):
            yield self._featurize(split, order[start : start + bs])

    def train_batches(self, seed: int = 0):
        return self.batches("train", shuffle=True, seed=seed)

    def val_batches(self):
        return self.batches("valid")

    def test_batches(self):
        return self.batches("test")
