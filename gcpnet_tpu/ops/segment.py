"""Masked segment reductions on statically padded index arrays.

TPU-native replacement for the reference's torch_scatter calls
(e.g. /root/reference/src/models/components/gcpnet.py:946,
/root/reference/src/models/components/__init__.py:316-323): on TPU every
array has a static shape, so variable-size graphs are padded and reductions
carry explicit masks.  Semantics are matched to ``torch_scatter.scatter``:

- ``reduce="sum"``: masked entries contribute zero.
- ``reduce="mean"``: sum divided by a per-segment count clamped to >= 1
  (empty segments produce exactly 0, as torch_scatter does).  The numerator
  mask and the denominator (count) mask can differ — the reference sometimes
  zeroes masked rows while still counting them in the denominator
  (scalarize with a node mask, components/__init__.py:294-323).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

# How the [K, N, F] slot-axis reduction of the DENSE fixed-degree layout is
# emitted (GCPNET_DENSE_REDUCE):
#   "reshape" — data.reshape(K, N, F).sum(0); XLA retiles [K*N, F] into
#               [F/8, 8, K, N] form (profiled transpose copies ~9 ms/step
#               at LBA bench scale).
#   "matmul"  — ones[1, K] @ data.view(K, N*F): both reshapes are bitcasts
#               of the slot-major layout, the reduce rides the MXU.
#   "slices"  — an unrolled sum of K contiguous [N, F] row blocks.
DENSE_REDUCE_MODE = os.environ.get("GCPNET_DENSE_REDUCE", "reshape")


def _dense_slot_reduce(data: Array, degree: int, num_rows: int) -> Array:
    """Sum ``[degree*num_rows, ...]`` slot-major rows over the slot axis."""
    feat = data.shape[1:]
    if DENSE_REDUCE_MODE == "matmul" and data.ndim == 2:
        flat = data.reshape(degree, num_rows * feat[0])
        ones = jnp.ones((1, degree), dtype=data.dtype)
        out = jax.lax.dot_general(
            ones, flat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return out.reshape((num_rows,) + feat).astype(data.dtype)
    if DENSE_REDUCE_MODE == "slices":
        total = data[:num_rows]
        for k in range(1, degree):
            total = total + data[k * num_rows : (k + 1) * num_rows]
        return total
    return data.reshape((degree, num_rows) + feat).sum(axis=0)


def _apply_mask(data: Array, mask: Optional[Array]) -> Array:
    if mask is None:
        return data
    mask = mask.astype(data.dtype)
    return data * mask.reshape(mask.shape + (1,) * (data.ndim - mask.ndim))


# Pallas MXU segment-sum over sorted edges: None = auto (TPU only);
# set True/False to force (gcpnet_tpu.ops.pallas_segment).
USE_PALLAS_SEGMENT: Optional[bool] = None


def _pallas_enabled() -> bool:
    if USE_PALLAS_SEGMENT is not None:
        return USE_PALLAS_SEGMENT
    try:
        # "axon" is this stack's remote-TPU platform name; Pallas lowers to
        # Mosaic on it the same as on a local "tpu" platform.
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def segment_sum(
    data: Array,
    segment_ids: Array,
    num_segments: int,
    mask: Optional[Array] = None,
    row_splits: Optional[Array] = None,
    dense_degree: Optional[int] = None,
) -> Array:
    """Masked sum of ``data`` rows into ``num_segments`` buckets.

    Args:
      data: ``[E, ...]`` values to reduce.
      segment_ids: ``[E]`` int32 bucket index per row.  Padded rows may carry
        any in-range index as long as ``mask`` zeroes them.
      num_segments: static number of output rows.
      mask: optional ``[E]`` bool/float; masked-out rows contribute zero.
      row_splits: optional ``[num_segments+1]`` ranges when rows are sorted
        by segment (padding rows last) — routes through the Pallas MXU
        kernel on TPU.
      dense_degree: static K when rows follow the DENSE fixed-degree
        SLOT-MAJOR layout (row ``k*N+n`` belongs to segment ``n`` — see
        data.batching.densify_edges_by_receiver): the reduction becomes a
        plain ``[K, N, ...]`` axis-0 sum (a bitcast view under TPU tiling),
        avoiding the row-serial XLA scatter.  Requires ``mask`` (padding
        slots must contribute zero).
    """
    data = _apply_mask(data, mask)
    if dense_degree is not None:
        if data.shape[0] != num_segments * dense_degree:
            raise ValueError(
                f"segment_sum: dense layout expects {dense_degree} x "
                f"{num_segments} rows, got {data.shape[0]}"
            )
        if mask is None:
            raise ValueError(
                "segment_sum: dense_degree requires a mask zeroing the "
                "padding slots"
            )
        return _dense_slot_reduce(data, dense_degree, num_segments)
    if row_splits is not None and data.ndim == 2 and _pallas_enabled():
        if mask is None:
            # The sorted layout has tile-alignment holes between node tiles;
            # without a mask those padding rows would be summed into the
            # last node of each 128-node tile (and get spurious gradients
            # through the custom VJP).
            raise ValueError(
                "segment_sum: row_splits (Pallas sorted path) requires a "
                "mask zeroing the padding/alignment rows"
            )
        from gcpnet_tpu.ops.pallas_segment import segment_sum_sorted

        return segment_sum_sorted(data, row_splits, num_segments)
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_count(
    segment_ids: Array,
    num_segments: int,
    mask: Optional[Array] = None,
    dtype=jnp.float32,
    dense_degree: Optional[int] = None,
) -> Array:
    ones = _apply_mask(jnp.ones(segment_ids.shape, dtype=dtype), mask)
    if dense_degree is not None:
        return ones.reshape(dense_degree, num_segments).sum(axis=0)
    return jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)


def segment_mean(
    data: Array,
    segment_ids: Array,
    num_segments: int,
    mask: Optional[Array] = None,
    count_mask: Optional[Array] = None,
    row_splits: Optional[Array] = None,
    dense_degree: Optional[int] = None,
) -> Array:
    """Masked mean with torch_scatter ``reduce="mean"`` semantics.

    ``mask`` gates the numerator; ``count_mask`` gates the denominator
    (defaults to ``mask``).  Counts are clamped to >= 1 so empty segments
    yield 0 rather than NaN.  ``row_splits`` (sorted rows, pad-only count
    mask) routes the sum through the Pallas kernel and derives counts from
    the splits.  ``dense_degree`` routes sum and counts through the dense
    fixed-degree reductions (see segment_sum).
    """
    if count_mask is None:
        count_mask = mask
    total = segment_sum(
        data, segment_ids, num_segments, mask=mask, row_splits=row_splits,
        dense_degree=dense_degree,
    )
    # counts always via the masked scatter of ones: with the tile-aligned
    # sorted layout, split widths include alignment padding at node-tile
    # boundaries and cannot be used as counts
    count = segment_count(
        segment_ids, num_segments, mask=count_mask, dtype=total.dtype,
        dense_degree=dense_degree,
    )
    count = jnp.maximum(count, 1.0)
    return total / count.reshape(count.shape + (1,) * (total.ndim - 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gather_by_senders_perm(
    nodes: Array, senders: Array, sender_perm: Array, out_degree: int
) -> Array:
    return nodes[senders]


def _gbs_fwd(nodes, senders, sender_perm, out_degree):
    return nodes[senders], (sender_perm, nodes.shape[0])


def _gbs_bwd(out_degree, res, g):
    sender_perm, num_nodes = res
    # every real edge row appears in exactly one perm slot, so summing the
    # per-slot cotangents over the slot axis IS the scatter-add the plain
    # gather's VJP would emit — but as a gather + [K, N, C] axis-0 sum
    # (XLA scatters execute row-serially on TPU; see gather_by_senders)
    mask = (sender_perm >= 0).astype(g.dtype)[:, None]
    rows = g[jnp.maximum(sender_perm, 0)] * mask
    g_nodes = _dense_slot_reduce(rows, out_degree, num_nodes)
    return g_nodes, None, None


_gather_by_senders_perm.defvjp(_gbs_fwd, _gbs_bwd)


def gather_by_senders(
    nodes: Array,
    senders: Array,
    sender_perm: Optional[Array] = None,
    out_degree: Optional[int] = None,
) -> Array:
    """``nodes[senders]`` with a scatter-free backward pass.

    The plain gather's VJP is an XLA scatter-add of ``[E, C]`` edge
    cotangents into ``[N, C]`` nodes — row-serial on TPU (profiled at
    ~2.4 ms per call at LBA bench scale, x8 layers).  When the batch
    carries the SLOT-MAJOR sender-dense permutation (``sender_perm[k*N+n]``
    = edge row of node ``n``'s k-th outgoing edge, ``-1`` for padding —
    data.batching.densify_edges_by_receiver), the backward becomes a
    permutation gather + ``[K_out, N, C]`` axis-0 sum: both parallel ops.
    Falls back to the plain gather (scatter backward) without the perm.

    CONTRACT: the perm covers only REAL edges, so cotangents arriving at
    padding edge rows are dropped.  This is exact whenever every consumer
    of the gathered rows is gated by the edge padding mask before any
    reduction (true for the message stack, whose only output consumer is
    the masked segment aggregation, and for the force head's masked
    segment mean) — padding-row cotangents are then identically zero.
    """
    if sender_perm is None or out_degree is None:
        return nodes[senders]
    return _gather_by_senders_perm(
        nodes, senders, jnp.asarray(sender_perm), out_degree
    )


@jax.custom_vjp
def _edge_rows_to_slots(data: Array, sender_perm: Array, inv_perm: Array):
    """``data[sender_perm]`` with padding slots zeroed — and a SCATTER-FREE
    backward: sender_perm places every real edge row in exactly one slot,
    so the scatter the plain gather's VJP would emit is a permutation, and
    the inverse permutation turns it into a gather
    (``g_data[e] = g_slots[inv_perm[e]]``, zero for padding edges)."""
    valid = (sender_perm >= 0).astype(data.dtype)
    rows = data[jnp.maximum(sender_perm, 0)]
    return rows * valid.reshape(valid.shape + (1,) * (data.ndim - 1))


def _erts_fwd(data, sender_perm, inv_perm):
    return _edge_rows_to_slots(data, sender_perm, inv_perm), inv_perm


def _erts_bwd(inv_perm, g):
    valid = (inv_perm >= 0).astype(g.dtype)
    g_data = g[jnp.maximum(inv_perm, 0)]
    g_data = g_data * valid.reshape(valid.shape + (1,) * (g.ndim - 1))
    return g_data, None, None


_edge_rows_to_slots.defvjp(_erts_fwd, _erts_bwd)


def _slot_rows(
    data: Array,
    sender_perm: Array,
    inv_perm: Optional[Array],
) -> Array:
    """Edge rows re-laid into the SLOT-MAJOR sender-dense layout
    (``[K_out*N, ...]``; padding slots zero).  With ``inv_perm`` the
    backward is an inverse-permutation gather; without it, the plain
    gather's VJP emits an XLA scatter-add into the edge rows (row-serial
    on TPU — fine when nothing upstream needs gradients, e.g. frames)."""
    sender_perm = jnp.asarray(sender_perm)
    data = jnp.asarray(data)
    if inv_perm is not None:
        return _edge_rows_to_slots(data, sender_perm, jnp.asarray(inv_perm))
    valid = (sender_perm >= 0).astype(data.dtype)
    rows = data[jnp.maximum(sender_perm, 0)]
    return rows * valid.reshape(valid.shape + (1,) * (data.ndim - 1))


def sender_sum(
    data: Array,
    senders: Array,
    num_nodes: int,
    mask: Optional[Array] = None,
    sender_perm: Optional[Array] = None,
    out_degree: Optional[int] = None,
    inv_perm: Optional[Array] = None,
) -> Array:
    """Masked sum of edge rows keyed by ``senders`` (segment_sum over the
    source index), scatter-free in both directions when the sender-dense
    perm (+ inverse) is available: a slot gather + ``[K_out, N, C]`` axis-0
    sum forward, an inverse-permutation gather backward.  Summation order
    differs from the scatter path only by float associativity."""
    if sender_perm is None or out_degree is None:
        return segment_sum(data, senders, num_nodes, mask=mask)
    rows = _slot_rows(_apply_mask(jnp.asarray(data), mask), sender_perm, inv_perm)
    return _dense_slot_reduce(rows, out_degree, num_nodes)


def sender_mean(
    data: Array,
    senders: Array,
    num_nodes: int,
    mask: Optional[Array] = None,
    count_mask: Optional[Array] = None,
    sender_perm: Optional[Array] = None,
    out_degree: Optional[int] = None,
    inv_perm: Optional[Array] = None,
) -> Array:
    """Per-node masked mean of outgoing-edge rows (segment_mean keyed by
    ``senders``), scatter-free when the sender-dense perm is available:
    the numerator becomes a permutation gather + ``[K_out, N, C]`` axis-0
    sum (and with ``inv_perm`` the backward is a gather too — see
    sender_sum).  Same ``mask``/``count_mask`` semantics as segment_mean.
    Summation order differs from the scatter path only by float
    associativity.
    """
    if sender_perm is None or out_degree is None:
        return segment_mean(
            data, senders, num_nodes,
            mask=mask, count_mask=count_mask,
        )
    sender_perm = jnp.asarray(sender_perm)
    data = _apply_mask(jnp.asarray(data), mask)
    rows = _slot_rows(data, sender_perm, inv_perm)
    total = _dense_slot_reduce(rows, out_degree, num_nodes)
    if count_mask is None:
        count_mask = mask
    valid = sender_perm >= 0
    idx = jnp.maximum(sender_perm, 0)
    cm = (
        valid
        if count_mask is None
        else (valid & jnp.asarray(count_mask)[idx].astype(bool))
    )
    count = cm.astype(total.dtype).reshape(out_degree, num_nodes).sum(axis=0)
    count = jnp.maximum(count, 1.0)
    return total / count.reshape(count.shape + (1,) * (total.ndim - 1))


def segment_softmax_denominator(
    logits: Array,
    segment_ids: Array,
    num_segments: int,
    mask: Optional[Array] = None,
) -> Array:
    """Numerically stable per-segment softmax normalizer (utility for
    attention-style aggregations)."""
    maxes = jax.ops.segment_max(
        jnp.where(mask if mask is not None else True, logits, -jnp.inf),
        segment_ids,
        num_segments=num_segments,
    )
    maxes = jnp.where(jnp.isfinite(maxes), maxes, 0.0)
    shifted = jnp.exp(logits - maxes[segment_ids])
    denom = segment_sum(shifted, segment_ids, num_segments, mask=mask)
    return shifted / jnp.maximum(denom[segment_ids], 1e-20)


def masked_mean(
    data: Array, mask: Optional[Array], axis=None, keepdims: bool = False
) -> Array:
    """Mean over ``axis`` counting only elements where (broadcast) ``mask``
    is set — e.g. a [N] mask over [N, 3] data counts 3 elements per valid
    row, matching ``nn.MSELoss`` over the valid rows."""
    if mask is None:
        return jnp.mean(data, axis=axis, keepdims=keepdims)
    m = mask.astype(data.dtype)
    m = m.reshape(m.shape + (1,) * (data.ndim - m.ndim))
    m = jnp.broadcast_to(m, data.shape)
    total = jnp.sum(data * m, axis=axis, keepdims=keepdims)
    count = jnp.sum(m, axis=axis, keepdims=keepdims)
    count = jnp.broadcast_to(count, total.shape)
    return total / jnp.maximum(count, 1.0)
