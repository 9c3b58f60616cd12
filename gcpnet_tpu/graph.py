"""Statically padded graph batches.

TPU-native replacement for PyG ``Data``/``Batch``
(/root/reference/src/datamodules/components/atom3d_dataset.py:124-130 and
friends).  Every batch has static ``(num_nodes, num_edges, num_graphs)``
shapes so the whole training step compiles once per shape bucket; validity
is tracked with explicit boolean masks instead of the reference's dynamic
shapes / ``inf`` sentinels.

Feature conventions follow the reference (SURVEY.md §2.5): node scalars
``h [N, ds]`` (or int atom types ``[N]``), node vectors ``chi [N, m, 3]``,
edge scalars ``e [E, de]``, edge vectors ``xi [E, me, 3]``, positions
``x [N, 3]``, directed edges ``senders -> receivers`` where ``senders``
corresponds to the reference's ``edge_index[0]`` (row / source) and
``receivers`` to ``edge_index[1]`` (col / destination).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

Array = Any  # jax.Array or np.ndarray; GraphBatch is host- and device-friendly


class GraphBatch(struct.PyTreeNode):
    """A padded batch of graphs with static shapes.

    Attributes:
      h:    [N, ds] node scalar features (float) or [N] int atom-type ids.
      chi:  [N, m, 3] node vector features.
      e:    [E, de] edge scalar features.
      xi:   [E, me, 3] edge vector features.
      x:    [N, 3] node positions.
      senders:   [E] int32 source node index per edge (reference row).
      receivers: [E] int32 destination node index per edge (reference col).
      graph_id:  [N] int32 graph index per node (reference ``batch.batch``).
      node_pad_mask:  [N] bool, True for real nodes.
      edge_pad_mask:  [E] bool, True for real edges.
      graph_pad_mask: [G] bool, True for real graphs.
      node_mask: optional [N] bool semantic mask (reference ``batch.mask``):
        nodes that exist but whose features are invalid (e.g. residues with
        non-finite coordinates).  ``None`` when a task has no such mask.
      extras: task-specific arrays keyed by name (labels, lig_flag, seq, ...).
    """

    h: Array
    chi: Array
    e: Array
    xi: Array
    x: Array
    senders: Array
    receivers: Array
    graph_id: Array
    node_pad_mask: Array
    edge_pad_mask: Array
    graph_pad_mask: Array
    node_mask: Optional[Array] = None
    # optional: [N+1] per-shard edge row-splits when edges are sorted by
    # receiver (enables the Pallas MXU segment-sum path; see
    # gcpnet_tpu.ops.pallas_segment and data.batching.sort_edges_by_receiver)
    edge_row_splits: Optional[Array] = None
    extras: Dict[str, Array] = struct.field(default_factory=dict)
    # static (non-pytree) marker for the DENSE fixed-degree edge layout
    # (data.batching.densify_edges_by_receiver): edge row n*K+j belongs to
    # receiver node n (slot j), so receiver-side gathers become broadcasts
    # and receiver-side segment reductions become [N, K, C] axis-1 sums —
    # no XLA scatter, which serializes per row on TPU (~3.5% of HBM
    # bandwidth measured on v5e; see scripts/analyze_profile.py).
    edge_dense_degree: Optional[int] = struct.field(
        pytree_node=False, default=None
    )
    # optional SLOT-MAJOR sender-dense permutation: [K_out * N] int32 where
    # row k*N + n is the edge row of node n's k-th OUTGOING edge (-1 for
    # padding slots).  Lets sender-keyed gathers run with a scatter-free
    # backward and sender-keyed means run scatter-free forward
    # (ops.segment.gather_by_senders / sender_mean).
    sender_perm: Optional[Array] = None
    # static slot count K_out of sender_perm (max out-degree budget)
    sender_out_degree: Optional[int] = struct.field(
        pytree_node=False, default=None
    )
    # optional inverse of sender_perm: [E] int32 where entry e is the perm
    # slot holding edge row e (-1 for padding edges).  Because sender_perm
    # places every real edge in exactly one slot, the backward of the
    # slot gather ``data[sender_perm]`` is a PERMUTATION scatter — with the
    # inverse it runs as a plain gather instead (ops.segment.sender_sum /
    # sender_mean), keeping the sender-keyed aggregation scatter-free in
    # BOTH directions.
    sender_inv_perm: Optional[Array] = None

    @property
    def num_nodes(self) -> int:
        return self.x.shape[0]

    @property
    def num_edges(self) -> int:
        return self.senders.shape[0]

    @property
    def num_graphs(self) -> int:
        return self.graph_pad_mask.shape[0]

    def valid_node_mask(self) -> Array:
        """Padding mask AND semantic mask."""
        if self.node_mask is None:
            return self.node_pad_mask
        return self.node_pad_mask & self.node_mask

    def valid_edge_mask(self) -> Array:
        """Edges whose both endpoints are semantically valid (and real)."""
        if self.node_mask is None:
            return self.edge_pad_mask
        nm = self.valid_node_mask()
        return self.edge_pad_mask & nm[self.senders] & nm[self.receivers]

    def replace_extras(self, **kwargs: Array) -> "GraphBatch":
        extras = dict(self.extras)
        extras.update(kwargs)
        return self.replace(extras=extras)


@dataclasses.dataclass
class GraphData:
    """A single unpadded graph on the host (numpy).  The loose analog of a
    PyG ``Data`` record, produced by featurizers before padding."""

    h: np.ndarray
    chi: np.ndarray
    e: np.ndarray
    xi: np.ndarray
    x: np.ndarray
    senders: np.ndarray
    receivers: np.ndarray
    node_mask: Optional[np.ndarray] = None
    extras: Dict[str, np.ndarray] = dataclasses.field(default_factory=dict)

    @property
    def num_nodes(self) -> int:
        return int(self.x.shape[0])

    @property
    def num_edges(self) -> int:
        return int(self.senders.shape[0])


def _pad_axis0(arr: np.ndarray, target: int, fill=0) -> np.ndarray:
    pad = target - arr.shape[0]
    if pad < 0:
        raise ValueError(
            f"cannot pad array of leading dim {arr.shape[0]} to smaller {target}"
        )
    if pad == 0:
        return arr
    widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, widths, constant_values=fill)


def batch_graphs(
    graphs: Sequence[GraphData],
    num_nodes: int,
    num_edges: int,
    num_graphs: Optional[int] = None,
    extra_graph_keys: Sequence[str] = (),
    like: Optional[GraphData] = None,
) -> GraphBatch:
    """Concatenate and pad a list of host graphs into one static batch.

    Padded edges point at node 0 but are masked out; padded nodes belong to
    graph 0 but are masked out.  Per-node/per-edge extras are concatenated
    and zero-padded along axis 0; extras named in ``extra_graph_keys`` are
    treated as per-graph and padded to ``num_graphs``.

    ``like`` supplies feature dims when ``graphs`` is empty (an all-padding
    shard in a multi-device batch).
    """
    if num_graphs is None:
        num_graphs = max(len(graphs), 1)
    if not graphs:
        # an all-padding shard: dims taken from the `like` template
        if like is None:
            raise ValueError("empty graph list requires a `like` template")

        def z(arr, n):
            a = np.asarray(arr)
            return np.zeros((n,) + a.shape[1:], a.dtype)

        extras = {}
        for key, v in like.extras.items():
            if key in extra_graph_keys:
                # per-graph extras are stacked, so the template value is one
                # graph's entry
                extras[key] = np.zeros(
                    (num_graphs,) + np.asarray(v).shape, np.asarray(v).dtype
                )
            else:
                n_tgt = (
                    num_edges
                    if np.asarray(v).shape[0] == like.num_edges
                    and like.num_edges != like.num_nodes
                    else num_nodes
                )
                extras[key] = z(v, n_tgt)
        return GraphBatch(
            h=z(like.h, num_nodes),
            chi=z(like.chi, num_nodes),
            e=z(like.e, num_edges),
            xi=z(like.xi, num_edges),
            x=np.zeros((num_nodes, 3), np.float32),
            senders=np.zeros(num_edges, np.int32),
            receivers=np.zeros(num_edges, np.int32),
            graph_id=np.zeros(num_nodes, np.int32),
            node_pad_mask=np.zeros(num_nodes, bool),
            edge_pad_mask=np.zeros(num_edges, bool),
            graph_pad_mask=np.zeros(num_graphs, bool),
            node_mask=np.zeros(num_nodes, bool)
            if like.node_mask is not None
            else None,
            extras=extras,
        )
    if len(graphs) > num_graphs:
        raise ValueError(f"{len(graphs)} graphs exceed budget {num_graphs}")
    tot_n = sum(g.num_nodes for g in graphs)
    tot_e = sum(g.num_edges for g in graphs)
    if tot_n > num_nodes or tot_e > num_edges:
        raise ValueError(
            f"batch ({tot_n} nodes, {tot_e} edges) exceeds budget "
            f"({num_nodes}, {num_edges})"
        )

    h = np.concatenate([np.asarray(g.h) for g in graphs], axis=0)
    chi = np.concatenate([np.asarray(g.chi) for g in graphs], axis=0)
    e = np.concatenate([np.asarray(g.e) for g in graphs], axis=0)
    xi = np.concatenate([np.asarray(g.xi) for g in graphs], axis=0)
    x = np.concatenate([np.asarray(g.x) for g in graphs], axis=0)

    senders_l, receivers_l, graph_id_l = [], [], []
    offset = 0
    for gi, g in enumerate(graphs):
        senders_l.append(np.asarray(g.senders) + offset)
        receivers_l.append(np.asarray(g.receivers) + offset)
        graph_id_l.append(np.full(g.num_nodes, gi, dtype=np.int32))
        offset += g.num_nodes
    senders = np.concatenate(senders_l).astype(np.int32)
    receivers = np.concatenate(receivers_l).astype(np.int32)
    graph_id = np.concatenate(graph_id_l).astype(np.int32)

    node_pad_mask = np.zeros(num_nodes, dtype=bool)
    node_pad_mask[:tot_n] = True
    edge_pad_mask = np.zeros(num_edges, dtype=bool)
    edge_pad_mask[:tot_e] = True
    graph_pad_mask = np.zeros(num_graphs, dtype=bool)
    graph_pad_mask[: len(graphs)] = True

    node_mask = None
    if any(g.node_mask is not None for g in graphs):
        node_mask = np.concatenate(
            [
                np.asarray(g.node_mask)
                if g.node_mask is not None
                else np.ones(g.num_nodes, dtype=bool)
                for g in graphs
            ]
        )
        node_mask = _pad_axis0(node_mask.astype(bool), num_nodes, fill=False)

    extras: Dict[str, np.ndarray] = {}
    keys = set()
    for g in graphs:
        keys.update(g.extras.keys())
    for key in sorted(keys):
        arrs = [np.asarray(g.extras[key]) for g in graphs if key in g.extras]
        if len(arrs) != len(graphs):
            raise ValueError(f"extra '{key}' missing from some graphs in batch")
        if key in extra_graph_keys:
            stacked = np.stack([np.asarray(a) for a in arrs], axis=0)
            extras[key] = _pad_axis0(stacked, num_graphs)
        else:
            cat = np.concatenate(arrs, axis=0)
            target = num_edges if cat.shape[0] == tot_e and tot_e != tot_n else num_nodes
            extras[key] = _pad_axis0(cat, target)

    return GraphBatch(
        h=_pad_axis0(h, num_nodes),
        chi=_pad_axis0(chi, num_nodes),
        e=_pad_axis0(e, num_edges),
        xi=_pad_axis0(xi, num_edges),
        x=_pad_axis0(x, num_nodes),
        senders=_pad_axis0(senders, num_edges),
        receivers=_pad_axis0(receivers, num_edges),
        graph_id=_pad_axis0(graph_id, num_nodes),
        node_pad_mask=node_pad_mask,
        edge_pad_mask=edge_pad_mask,
        graph_pad_mask=graph_pad_mask,
        node_mask=node_mask,
        extras=extras,
    )


def device_put_batch(batch: GraphBatch, sharding=None) -> GraphBatch:
    """Move a host GraphBatch to device (optionally with a sharding)."""
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(jnp.asarray(a), sharding), batch
    )
