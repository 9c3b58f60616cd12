"""Fused edge-map Pallas kernel: the whole GCP message stack on
VMEM-resident edge blocks.

The reference's hottest loop (8-GCP edge-message stack + scatter,
/root/reference/src/models/components/gcpnet.py:899-947) is, run op-by-op,
HBM-bandwidth- and op-launch-bound on TPU: every GCP layer's intermediates
are [E, ~hidden] tensors round-tripping HBM (E ~ 200k edges/batch).

``edge_map`` computes ``fn(params, edge_data[block])`` over row blocks of
the edge array with ordinary Pallas block pipelining (double-buffered
automatically); ``fn`` — the entire message stack — is traced INTO the
kernel, so none of its intermediates ever touch HBM.  Blocks are large
(512 rows) so the stack's small matmuls amortize their MXU latency.

The backward pass is a second kernel over the same grid that RECOMPUTES
``fn`` per block under ``jax.vjp``: per-block input grads stream out as a
blocked output, and weight grads accumulate across the sequential TPU grid
into VMEM-resident f32 blocks.  Activation memory is O(block), not O(E) —
rematerialization is structural.

``fused_edge_map_segment_sum`` composes the map with the receiver-sorted
MXU segment reduction (gcpnet_tpu.ops.pallas_segment): messages make one
[E, D] HBM round-trip between map and reduce (~0.3 ms at LBA bench scale)
— measured cheaper than fusing the reduction into the map kernel, which
forces small node-tile-aligned chunks whose per-matmul latency dominates.

Masking contract: rows of ``edge_data`` outside every segment (alignment
holes / tail padding) must be zeroed by ``fn`` via a mask column; their
cotangent is zeroed by the same mask's transpose.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gcpnet_tpu.ops.pallas_segment import segment_sum_sorted

# Rows per forward block.  The backward re-runs fn under jax.vjp (primal
# residuals + cotangents live simultaneously), so it runs half-size blocks.
BLOCK = 512
BWD_BLOCK = 256

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


def _const_index_map(ndim):
    return lambda i: (0,) * ndim


def _prep(edge_data, rows_multiple):
    e, f = edge_data.shape
    f_pad = _pad_to(max(f, 1), 128)
    e_pad = _pad_to(max(e, 1), rows_multiple)
    if f_pad != f or e_pad != e:
        edge_data = jnp.zeros((e_pad, f_pad), edge_data.dtype).at[:e, :f].set(
            edge_data
        )
    return edge_data, e_pad, f_pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 3))
def edge_map(fn: Callable, params, edge_data: jax.Array, out_dim: int):
    """``out[e] = fn(params, edge_data[e])`` with ``fn`` fused into one
    Pallas kernel per row block.  ``fn(params, block [B, F_pad]) ->
    [B, out_dim]`` must be pure jnp (elementwise + matmul; no segment ops).
    Compute runs in the INPUT dtype (bf16 stays bf16 — dots must carry
    their own f32 accumulators via ``preferred_element_type``, see
    ``gcp._mm``); weight-grad accumulation across grid steps is f32."""
    return _map_impl(fn, params, edge_data, out_dim, BLOCK)


def _map_impl(fn, params, edge_data, out_dim, block):
    e, _f = edge_data.shape
    data_p, e_pad, f_pad = _prep(edge_data, block)
    out_pad = _pad_to(max(out_dim, 1), 128)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    dtype = edge_data.dtype
    grid = e_pad // block

    def kernel(data_ref, *rest):
        leaf_refs, out_ref = rest[:-1], rest[-1]
        p = jax.tree_util.tree_unflatten(
            treedef, [r[:].astype(dtype) for r in leaf_refs]
        )
        msg = fn(p, data_ref[:])
        if msg.shape[-1] < out_pad:
            msg = jnp.concatenate(
                [
                    msg,
                    jnp.zeros((block, out_pad - msg.shape[-1]), msg.dtype),
                ],
                axis=-1,
            )
        out_ref[:] = msg.astype(out_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((block, f_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [
            pl.BlockSpec(leaf.shape, _const_index_map(leaf.ndim),
                         memory_space=pltpu.VMEM)
            for leaf in leaves
        ],
        out_specs=pl.BlockSpec((block, out_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((e_pad, out_pad), dtype),
    )(data_p, *leaves)
    return out[:e, :out_dim]


def _map_fwd(fn, params, edge_data, out_dim):
    return _map_impl(fn, params, edge_data, out_dim, BLOCK), (
        params,
        edge_data,
    )


def _map_bwd(fn, out_dim, res, g):
    params, edge_data = res
    e, f = edge_data.shape
    block = BWD_BLOCK
    data_p, e_pad, f_pad = _prep(edge_data, block)
    out_pad = _pad_to(max(out_dim, 1), 128)
    g_p = jnp.zeros((e_pad, out_pad), g.dtype).at[:e, :out_dim].set(g)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    dtype = edge_data.dtype
    grid = e_pad // block

    def kernel(data_ref, g_ref, *rest):
        n = len(leaves)
        leaf_refs = rest[:n]
        ddata_ref = rest[n]
        dleaf_refs = rest[n + 1 :]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            for r in dleaf_refs:
                r[:] = jnp.zeros_like(r)

        p = jax.tree_util.tree_unflatten(
            treedef, [r[:].astype(dtype) for r in leaf_refs]
        )
        block_data = data_ref[:]
        cot = g_ref[:][:, :out_dim].astype(dtype)
        _, vjp_fn = jax.vjp(fn, p, block_data)
        dp, dblock = vjp_fn(cot)
        ddata_ref[:] = dblock.astype(ddata_ref.dtype)
        for r, val in zip(dleaf_refs, jax.tree_util.tree_leaves(dp)):
            r[:] += val.astype(jnp.float32)

    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block, f_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, out_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        + [
            pl.BlockSpec(leaf.shape, _const_index_map(leaf.ndim),
                         memory_space=pltpu.VMEM)
            for leaf in leaves
        ],
        out_specs=[pl.BlockSpec((block, f_pad), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)]
        + [
            pl.BlockSpec(leaf.shape, _const_index_map(leaf.ndim),
                         memory_space=pltpu.VMEM)
            for leaf in leaves
        ],
        out_shape=[jax.ShapeDtypeStruct((e_pad, f_pad), dtype)]
        + [jax.ShapeDtypeStruct(leaf.shape, jnp.float32) for leaf in leaves],
        # the stack vjp's primal residuals exceed Mosaic's default 16 MB
        # scoped-VMEM budget; v5e cores have headroom above it
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
    )(data_p, g_p, *leaves)
    ddata = outs[0][:e, :f]
    dleaves = [d.astype(l.dtype) for d, l in zip(outs[1:], leaves)]
    return (jax.tree_util.tree_unflatten(treedef, dleaves), ddata)


edge_map.defvjp(_map_fwd, _map_bwd)


def fused_edge_map_segment_sum(
    fn: Callable,
    params,
    edge_data: jax.Array,
    row_splits: jax.Array,
    num_nodes: int,
    out_dim: int,
):
    """``out[n] = sum_{e in seg(n)} fn(params, edge_data[e])`` over the
    receiver-sorted tile-aligned layout (sort_edges_by_receiver): the fused
    map kernel followed by the MXU sorted segment reduction.  ``fn`` must
    zero rows outside every segment via its mask column — the reduction
    attributes alignment-hole rows to the preceding node."""
    msgs = edge_map(fn, params, edge_data, out_dim)
    return segment_sum_sorted(msgs, row_splits, num_nodes)
