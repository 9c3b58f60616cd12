"""Fused per-edge map + segmented reduction: the Pallas kernel behind the
hot message-passing loop.

The reference's hottest loop (8-GCP edge-message stack + scatter,
/root/reference/src/models/components/gcpnet.py:899-947) is, on TPU, HBM-
bandwidth-bound when run op-by-op: every GCP layer's intermediates are
[E, ~hidden] tensors round-tripping HBM (E ~ 200k edges per batch).  This
kernel computes

    out[n] = sum_{e in segment(n)} fn(params, edge_data[e])

entirely out of VMEM: the grid runs over 128-node tiles of a receiver-
sorted edge layout (gcpnet_tpu.data.batching.sort_edges_by_receiver);
each program streams its tile's contiguous edge range in double-buffered
128-edge chunks, applies ``fn`` (an arbitrary traced jnp function — here
the whole GCP message stack) while the chunk is VMEM-resident, and
accumulates messages into the 128 node rows with a one-hot matmul on the
MXU.  No intermediate of ``fn`` ever touches HBM.

The backward pass is a second kernel over the same grid that RECOMPUTES
``fn`` per chunk under ``jax.vjp``: the node cotangent is gathered to edges
with the transposed one-hot matmul, per-chunk input grads are DMA'd out
(double-buffered), and weight grads accumulate across the sequential TPU
grid into VMEM-resident blocks (f32).  Activation memory is O(chunk), not
O(E) — rematerialization is structural.

Layout contract (see sort_edges_by_receiver): edges sorted by receiver,
each 128-node tile's segment padded to a 128-edge boundary, ``row_splits
[N+1]`` holding each node's [start, end) range.  Rows in alignment holes /
tail padding belong to no node: ``fn`` must zero them via a mask column in
``edge_data`` (their cotangent is automatically zero).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TN = 128  # node rows per program (must equal the host layout's tile)
CHUNK = 128  # edges per inner step (host tile alignment quantum)
BOUNDS_W = 2 * TN

# None = auto (on for TPU backends); True/False forces.  Mirrors
# gcpnet_tpu.ops.segment.USE_PALLAS_SEGMENT.
USE_FUSED_MESSAGE: Optional[bool] = None


def fused_enabled() -> bool:
    if USE_FUSED_MESSAGE is not None:
        return USE_FUSED_MESSAGE
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _layout(row_splits, num_nodes: int, num_edges_padded: int):
    """Per-tile coarse ranges + per-tile node boundaries.

    ``tile_splits[grid]`` is forced to the padded edge count so the tile
    ranges PARTITION [0, e_pad): every edge row (incl. tail padding) is
    visited by exactly one program — forward contributions of non-segment
    rows vanish through the one-hot, and the backward kernel writes every
    grad row exactly once (zeros for padding, no aliasing needed).
    """
    n_pad = _pad_to(max(num_nodes, 1), TN)
    grid = n_pad // TN
    sentinel = ((row_splits[-1] + CHUNK - 1) // CHUNK) * CHUNK
    splits_full = jnp.full((n_pad + 1,), sentinel, jnp.int32)
    splits_full = splits_full.at[: num_nodes + 1].set(
        row_splits.astype(jnp.int32)
    )
    tile_splits = splits_full[::TN]
    tile_splits = tile_splits.at[-1].set(num_edges_padded)

    bounds = jnp.zeros((grid, 8, BOUNDS_W), jnp.int32)
    idx = (jnp.arange(grid)[:, None] * TN) + jnp.arange(TN + 1)[None, :]
    bounds = bounds.at[:, 0, : TN + 1].set(splits_full[idx])
    return tile_splits, bounds, grid, n_pad


def _prep_data(edge_data):
    e, f = edge_data.shape
    f_pad = _pad_to(max(f, 1), 128)
    e_pad = _pad_to(max(e, 1), CHUNK)
    if f_pad != f or e_pad != e:
        edge_data = jnp.zeros((e_pad, f_pad), edge_data.dtype).at[:e, :f].set(
            edge_data
        )
    return edge_data, e_pad, f_pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 4, 5))
def fused_edge_map_segment_sum(
    fn: Callable,
    params,
    edge_data: jax.Array,
    row_splits: jax.Array,
    num_nodes: int,
    out_dim: int,
):
    """``out[n] = sum_{e in seg(n)} fn(params, edge_data[e])`` (see module
    docstring).  ``fn(params, chunk [CHUNK, F_pad]) -> [CHUNK, out_dim]``
    must be pure jnp (elementwise + matmul — no segment ops) and zero its
    output on rows whose mask column is 0."""
    return _fwd_impl(fn, params, edge_data, row_splits, num_nodes, out_dim)


def _fwd_impl(fn, params, edge_data, row_splits, num_nodes, out_dim):
    data_p, e_pad, f_pad = _prep_data(edge_data)
    tile_splits, bounds, grid, n_pad = _layout(row_splits, num_nodes, e_pad)
    out_pad = _pad_to(max(out_dim, 1), 128)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    dtype = edge_data.dtype

    def kernel(ts_ref, bounds_ref, data_ref, *rest):
        leaf_refs, out_ref = rest[:-1], rest[-1]
        i = pl.program_id(0)
        e_start = pl.multiple_of(ts_ref[i], CHUNK)
        e_end = ts_ref[i + 1]
        nchunks = pl.cdiv(e_end - e_start, CHUNK)
        lo = bounds_ref[0, 0, :TN].reshape(1, TN)
        hi = bounds_ref[0, 0, 1 : TN + 1].reshape(1, TN)
        p = jax.tree_util.tree_unflatten(treedef, [r[:] for r in leaf_refs])

        def body(scratch, sems):
            def in_dma(slot, c):
                return pltpu.make_async_copy(
                    data_ref.at[pl.ds(e_start + c * CHUNK, CHUNK), :],
                    scratch.at[slot],
                    sems.at[slot],
                )

            @pl.when(nchunks > 0)
            def _():
                in_dma(0, 0).start()

            def step(c, acc):
                slot = jax.lax.rem(c, 2)

                @pl.when(c + 1 < nchunks)
                def _():
                    in_dma(1 - slot, c + 1).start()

                in_dma(slot, c).wait()
                msg = fn(p, scratch[slot])  # [CHUNK, out_dim]
                if msg.shape[-1] < out_pad:
                    msg = jnp.concatenate(
                        [
                            msg,
                            jnp.zeros(
                                (CHUNK, out_pad - msg.shape[-1]), msg.dtype
                            ),
                        ],
                        axis=-1,
                    )
                gids = (
                    e_start
                    + c * CHUNK
                    + jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
                )
                oh = ((gids >= lo) & (gids < hi)).astype(msg.dtype)
                acc += jax.lax.dot_general(
                    oh,
                    msg,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return acc

            acc = jax.lax.fori_loop(
                0, nchunks, step, jnp.zeros((TN, out_pad), jnp.float32)
            )
            out_ref[:] = acc.astype(out_ref.dtype)

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((2, CHUNK, f_pad), dtype),
            sems=pltpu.SemaphoreType.DMA((2,)),
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (1, 8, BOUNDS_W), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        + [
            pl.BlockSpec(
                leaf.shape, _const_index_map(leaf.ndim),
                memory_space=pltpu.VMEM,
            )
            for leaf in leaves
        ],
        out_specs=pl.BlockSpec(
            (TN, out_pad), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, out_pad), dtype),
    )(tile_splits, bounds, data_p, *leaves)
    return out[:num_nodes, :out_dim]


def _const_index_map(ndim):
    return lambda i, *_: (0,) * ndim


def _fwd(fn, params, edge_data, row_splits, num_nodes, out_dim):
    out = _fwd_impl(fn, params, edge_data, row_splits, num_nodes, out_dim)
    return out, (params, edge_data, row_splits)


def _bwd(fn, num_nodes, out_dim, res, g):
    params, edge_data, row_splits = res
    e, f = edge_data.shape
    data_p, e_pad, f_pad = _prep_data(edge_data)
    tile_splits, bounds, grid, n_pad = _layout(row_splits, num_nodes, e_pad)
    out_pad = _pad_to(max(out_dim, 1), 128)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    dtype = edge_data.dtype

    g_p = jnp.zeros((n_pad, out_pad), g.dtype).at[:num_nodes, :out_dim].set(g)

    def kernel(ts_ref, bounds_ref, g_ref, data_ref, *rest):
        n_leaves = len(leaves)
        leaf_refs = rest[:n_leaves]
        ddata_ref = rest[n_leaves]
        dleaf_refs = rest[n_leaves + 1 : 2 * n_leaves + 1]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            for r in dleaf_refs:
                r[:] = jnp.zeros_like(r)

        e_start = pl.multiple_of(ts_ref[i], CHUNK)
        e_end = ts_ref[i + 1]
        nchunks = pl.cdiv(e_end - e_start, CHUNK)
        lo = bounds_ref[0, 0, :TN].reshape(1, TN)
        hi = bounds_ref[0, 0, 1 : TN + 1].reshape(1, TN)
        p = jax.tree_util.tree_unflatten(treedef, [r[:] for r in leaf_refs])
        g_tile = g_ref[:]  # [TN, out_pad]

        def body(in_scratch, out_scratch, in_sems, out_sems):
            def in_dma(slot, c):
                return pltpu.make_async_copy(
                    data_ref.at[pl.ds(e_start + c * CHUNK, CHUNK), :],
                    in_scratch.at[slot],
                    in_sems.at[slot],
                )

            def out_dma(slot, c):
                return pltpu.make_async_copy(
                    out_scratch.at[slot],
                    ddata_ref.at[pl.ds(e_start + c * CHUNK, CHUNK), :],
                    out_sems.at[slot],
                )

            @pl.when(nchunks > 0)
            def _():
                in_dma(0, 0).start()

            def step(c, _):
                slot = jax.lax.rem(c, 2)

                @pl.when(c + 1 < nchunks)
                def _():
                    in_dma(1 - slot, c + 1).start()

                in_dma(slot, c).wait()
                chunk = in_scratch[slot]
                gids = (
                    e_start
                    + c * CHUNK
                    + jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
                )
                oh = ((gids >= lo) & (gids < hi)).astype(g_tile.dtype)
                # cotangent of this chunk's messages: rows outside any
                # segment get exactly zero -> their grads vanish through
                # the (linear) vjp even on garbage padding data
                cot = jnp.dot(
                    oh, g_tile, preferred_element_type=jnp.float32
                )[:, :out_dim].astype(chunk.dtype)
                _, vjp_fn = jax.vjp(fn, p, chunk)
                dp, dchunk = vjp_fn(cot)

                @pl.when(c >= 2)
                def _():
                    out_dma(slot, c - 2).wait()

                out_scratch[slot] = dchunk.astype(dtype)
                out_dma(slot, c).start()
                for r, val in zip(
                    dleaf_refs, jax.tree_util.tree_leaves(dp)
                ):
                    r[:] += val.astype(jnp.float32)
                return 0

            jax.lax.fori_loop(0, nchunks, step, 0)

            @pl.when(nchunks >= 2)
            def _():
                out_dma(jax.lax.rem(nchunks - 2, 2), nchunks - 2).wait()

            @pl.when(nchunks >= 1)
            def _():
                out_dma(jax.lax.rem(nchunks - 1, 2), nchunks - 1).wait()

        pl.run_scoped(
            body,
            in_scratch=pltpu.VMEM((2, CHUNK, f_pad), dtype),
            out_scratch=pltpu.VMEM((2, CHUNK, f_pad), dtype),
            in_sems=pltpu.SemaphoreType.DMA((2,)),
            out_sems=pltpu.SemaphoreType.DMA((2,)),
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (1, 8, BOUNDS_W), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (TN, out_pad), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        + [
            pl.BlockSpec(
                leaf.shape, _const_index_map(leaf.ndim),
                memory_space=pltpu.VMEM,
            )
            for leaf in leaves
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [
            pl.BlockSpec(
                leaf.shape, _const_index_map(leaf.ndim),
                memory_space=pltpu.VMEM,
            )
            for leaf in leaves
        ],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((e_pad, f_pad), dtype)]
        + [
            jax.ShapeDtypeStruct(leaf.shape, jnp.float32) for leaf in leaves
        ],
    )(tile_splits, bounds, g_p, data_p, *leaves)
    ddata = outs[0][:e, :f]
    dleaves = [
        d.astype(leaf.dtype) for d, leaf in zip(outs[1:], leaves)
    ]
    dparams = jax.tree_util.tree_unflatten(treedef, dleaves)
    return (dparams, ddata, None)


fused_edge_map_segment_sum.defvjp(_fwd, _bwd)
