"""Bucketed batching and device-sharded collation.

TPU-native replacement for the reference's edge-budget ``BatchSampler`` +
``DistributedSamplerWrapper`` (/root/reference/src/datamodules/components/
sampler.py:14-126): variable-size graphs are packed under a unit budget
into a small, fixed set of padded shape buckets (bounding XLA recompiles),
and multi-device batches are built as ``num_shards`` self-contained
sub-batches concatenated along axis 0 — each shard's edge indices are
local, so under ``shard_map`` over a ``dp`` mesh every device runs its
shard without cross-device gathers and only gradients ride the ICI psum.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from gcpnet_tpu.graph import GraphBatch, GraphData, batch_graphs


@dataclasses.dataclass(frozen=True)
class Bucket:
    """One static padded shape: (nodes, edges, graphs) per shard."""

    num_nodes: int
    num_edges: int
    num_graphs: int


def pack_by_budget(
    sizes: Sequence[Tuple[int, int]],
    max_units: int,
    unit: str = "edge",
    shuffle_order: Optional[np.ndarray] = None,
) -> List[List[int]]:
    """Greedy packing of graph indices into batches under a unit budget —
    the reference BatchSampler's strategy (sampler.py:14-59).

    Args:
      sizes: per-graph (num_nodes, num_edges).
      max_units: budget per batch (edge or node count).
      unit: "edge" | "node".
    """
    order = (
        shuffle_order if shuffle_order is not None else np.arange(len(sizes))
    )
    batches: List[List[int]] = []
    current: List[int] = []
    used = 0
    for idx in order:
        n, e = sizes[idx]
        u = e if unit == "edge" else n
        if u > max_units:
            continue  # oversized graph is dropped (reference behavior)
        if used + u > max_units and current:
            batches.append(current)
            current, used = [], 0
        current.append(int(idx))
        used += u
    if current:
        batches.append(current)
    return batches


def make_bucket(
    max_units: int, unit: str, num_graphs: int, avg_degree: float = 32.0
) -> Bucket:
    """Derive a padded bucket from a unit budget."""
    if unit == "edge":
        return Bucket(
            num_nodes=int(max_units / max(avg_degree, 1.0) * 1.5) + 8,
            num_edges=max_units,
            num_graphs=num_graphs,
        )
    return Bucket(
        num_nodes=max_units,
        num_edges=int(max_units * avg_degree) + 8,
        num_graphs=num_graphs,
    )


def sort_edges_by_receiver(batch: GraphBatch) -> GraphBatch:
    """Reorder one shard's edges so real edges are sorted by receiver (pad
    edges last) and attach [N+1] row splits, enabling the Pallas MXU
    segment-sum (gcpnet_tpu.ops.pallas_segment).  Host-side numpy."""
    receivers = np.asarray(batch.receivers)
    pad = ~np.asarray(batch.edge_pad_mask)
    # stable sort: (pad, receiver) so padding edges land at the tail
    order = np.lexsort((np.arange(receivers.shape[0]), receivers + pad * (batch.num_nodes + 1)))
    real = int((~pad).sum())
    sorted_recv = receivers[order][:real]
    counts = np.bincount(sorted_recv, minlength=batch.num_nodes)
    splits = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)

    def reorder(arr):
        return None if arr is None else np.asarray(arr)[order]

    extras = {
        k: (np.asarray(v)[order] if np.asarray(v).shape[:1] == receivers.shape else v)
        for k, v in batch.extras.items()
    }
    return batch.replace(
        e=reorder(batch.e),
        xi=reorder(batch.xi),
        senders=reorder(batch.senders),
        receivers=reorder(batch.receivers),
        edge_pad_mask=reorder(batch.edge_pad_mask),
        edge_row_splits=splits,
        extras=extras,
    )


def collate_shards(
    shard_graphs: Sequence[Sequence[GraphData]],
    bucket: Bucket,
    extra_graph_keys: Sequence[str] = (),
    like: Optional[GraphData] = None,
    sort_edges: bool = False,
) -> GraphBatch:
    """Build a device-shardable batch: one padded sub-batch per shard (with
    shard-local indices), concatenated along axis 0.

    Under ``shard_map`` with in_specs P('dp'), shard ``i`` sees exactly
    sub-batch ``i`` with valid local indices.
    """
    if like is None:
        for graphs in shard_graphs:
            if graphs:
                like = graphs[0]
                break
    shards = [
        batch_graphs(
            graphs,
            num_nodes=bucket.num_nodes,
            num_edges=bucket.num_edges,
            num_graphs=bucket.num_graphs,
            extra_graph_keys=extra_graph_keys,
            like=like,
        )
        for graphs in shard_graphs
    ]
    if sort_edges:
        shards = [sort_edges_by_receiver(s) for s in shards]
    if len(shards) == 1:
        return shards[0]
    first = shards[0]

    def cat(*arrs):
        if arrs[0] is None:
            return None
        return np.concatenate([np.asarray(a) for a in arrs], axis=0)

    import jax

    return jax.tree_util.tree_map(
        lambda *xs: cat(*xs), *shards, is_leaf=lambda x: x is None
    )


def batches_from_dataset(
    graphs: Iterable[GraphData],
    bucket: Bucket,
    num_shards: int = 1,
    shuffle_seed: Optional[int] = None,
    drop_last: bool = True,
    extra_graph_keys: Sequence[str] = (),
    sort_edges: bool = False,
) -> Iterator[GraphBatch]:
    """Pack a dataset of host graphs into device-sharded padded batches.

    Greedy fill: graphs are added to the current shard until node/edge/graph
    budgets would overflow, then the next shard starts; a batch is emitted
    when all ``num_shards`` shards are filled.
    """
    graphs = list(graphs)
    order = np.arange(len(graphs))
    if shuffle_seed is not None:
        np.random.default_rng(shuffle_seed).shuffle(order)

    shard: List[GraphData] = []
    shards: List[List[GraphData]] = []
    n_used = e_used = 0
    for idx in order:
        g = graphs[idx]
        if g.num_nodes > bucket.num_nodes or g.num_edges > bucket.num_edges:
            continue  # oversized graph dropped (logged by caller)
        overflow = (
            n_used + g.num_nodes > bucket.num_nodes
            or e_used + g.num_edges > bucket.num_edges
            or len(shard) >= bucket.num_graphs
        )
        if overflow:
            shards.append(shard)
            shard, n_used, e_used = [], 0, 0
            if len(shards) == num_shards:
                yield collate_shards(
                    shards, bucket, extra_graph_keys, sort_edges=sort_edges
                )
                shards = []
        shard.append(g)
        n_used += g.num_nodes
        e_used += g.num_edges
    if shard:
        shards.append(shard)
    if shards and not drop_last:
        while len(shards) < num_shards:
            shards.append([])
        yield collate_shards(shards, bucket, extra_graph_keys, sort_edges=sort_edges)
    elif len(shards) == num_shards:
        yield collate_shards(shards, bucket, extra_graph_keys, sort_edges=sort_edges)
