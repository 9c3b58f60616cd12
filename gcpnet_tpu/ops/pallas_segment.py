"""Pallas TPU kernels for edge->node segment reduction over sorted edges.

The hot loop's only non-matmul op is the scatter of edge messages into
nodes (gcpnet_tpu.nn.message_passing).  When the host pipeline sorts edges
by receiver (gcpnet_tpu.data.batching can guarantee this), the scatter
becomes a *contiguous segmented reduction*, which this kernel computes as
dense one-hot matmuls on the MXU:

  - grid over node tiles of TN=128 rows;
  - each program's edge range [splits[i*TN], splits[(i+1)*TN]) is
    contiguous; it is consumed in CHUNK=128-edge slices DMA'd from HBM
    with double buffering;
  - each slice builds a [CHUNK, TN] one-hot "edge belongs to row" matrix
    from the tile's segment boundaries and accumulates
    ``one_hot.T @ chunk`` into the output tile — a 128x128xD matmul that
    rides the MXU instead of a serialized scatter.

The backward pass (gather of the cotangent by edge segment) is a sorted
repeat, provided as a custom VJP.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TN = 128  # node rows per program
CHUNK = 128  # edges per inner step
BOUNDS_W = 2 * TN  # padded lane width of the per-tile bounds row


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _seg_sum_kernel(splits_ref, bounds_ref, data_ref, out_ref):
    """splits_ref: [grid+1] int32 SMEM (scalar prefetch; per-tile edge
    ranges); bounds_ref: [1, 8, BOUNDS_W] VMEM (this tile's TN+1 segment
    boundaries in row 0; 8 sublanes for mosaic tiling); data_ref:
    [E_pad, D] HBM; out_ref: [TN, D] VMEM."""
    i = pl.program_id(0)
    # tile starts are CHUNK-aligned by construction (host layout pads each
    # node-tile's edge segment to a 128-edge boundary)
    e_start = pl.multiple_of(splits_ref[i], CHUNK)
    e_end = splits_ref[i + 1]
    num_chunks = pl.cdiv(e_end - e_start, CHUNK)

    lo = bounds_ref[0, 0, :TN].reshape(1, TN)
    hi = bounds_ref[0, 0, 1 : TN + 1].reshape(1, TN)

    def body(scratch, sems):
        def get_dma(slot, c):
            return pltpu.make_async_copy(
                data_ref.at[pl.ds(e_start + c * CHUNK, CHUNK), :],
                scratch.at[slot],
                sems.at[slot],
            )

        @pl.when(num_chunks > 0)
        def _():
            get_dma(0, 0).start()

        def step(c, acc):
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < num_chunks)
            def _():
                get_dma(1 - slot, c + 1).start()

            get_dma(slot, c).wait()
            gids = (
                e_start
                + c * CHUNK
                + jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
            )
            # the one-hot contraction is exact in any dtype: products are
            # 0/x selections and accumulation stays f32
            oh = ((gids >= lo) & (gids < hi)).astype(scratch.dtype)
            acc += jax.lax.dot_general(
                oh,
                scratch[slot],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return acc

        acc = jax.lax.fori_loop(
            0, num_chunks, step, jnp.zeros(out_ref.shape, jnp.float32)
        )
        out_ref[:] = acc

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((2, CHUNK, out_ref.shape[1]), data_ref.dtype),
        sems=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def segment_sum_sorted(data: jax.Array, row_splits: jax.Array, num_nodes: int):
    """Sum rows of ``data`` [E, D] into ``num_nodes`` output rows.

    Edges must be sorted by segment; ``row_splits`` [num_nodes+1] gives each
    segment's [start, end) edge range (padding edges belong to no segment:
    route them after ``row_splits[-1]``).
    """
    return _seg_sum_fwd_impl(data, row_splits, num_nodes)


def _seg_sum_fwd_impl(data, row_splits, num_nodes):
    e, d = data.shape
    d_pad = _pad_to(max(d, 1), 128)
    n_pad = _pad_to(max(num_nodes, 1), TN)
    e_pad = _pad_to(max(e, 1), CHUNK) + CHUNK
    # keep the padded copy in the INPUT dtype: an f32 upcast of a bf16
    # [E, d_pad] edge array doubles its HBM footprint (OOMs large
    # batches); the kernel still accumulates in f32
    data_p = jnp.zeros((e_pad, d_pad), data.dtype).at[:e, :d].set(data)

    # full per-node boundaries; the pad sentinel is CHUNK-aligned so tile
    # starts beyond the last real node stay provably aligned
    sentinel = (
        (row_splits[-1] + CHUNK - 1) // CHUNK
    ) * CHUNK
    splits_full = jnp.full((n_pad + 1,), sentinel, jnp.int32)
    splits_full = splits_full.at[: num_nodes + 1].set(
        row_splits.astype(jnp.int32)
    )
    grid = n_pad // TN
    # per-tile coarse edge ranges (scalar prefetch)
    tile_splits = splits_full[:: TN]  # [grid + 1]
    # per-tile boundary rows for the one-hot comparison; shaped
    # [grid, 8, BOUNDS_W] so the VMEM block (1, 8, BOUNDS_W) satisfies the
    # mosaic (8, 128) tiling constraint
    bounds = jnp.zeros((grid, 8, BOUNDS_W), jnp.int32)
    for_idx = jnp.arange(TN + 1)
    gather_idx = (jnp.arange(grid)[:, None] * TN) + for_idx[None, :]
    bounds = bounds.at[:, 0, : TN + 1].set(splits_full[gather_idx])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (1, 8, BOUNDS_W),
                lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (TN, d_pad), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        _seg_sum_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, d_pad), jnp.float32),
    )(tile_splits, bounds, data_p)
    return out[:num_nodes, :d].astype(data.dtype)


def _seg_sum_fwd(data, row_splits, num_nodes):
    return _seg_sum_fwd_impl(data, row_splits, num_nodes), (
        row_splits,
        data.shape[0],
    )


def _seg_sum_bwd(num_nodes, res, g):
    row_splits, num_edges = res
    edge_ids = jnp.arange(num_edges)
    seg = jnp.searchsorted(
        row_splits[1 : num_nodes + 1], edge_ids, side="right"
    )
    grad = g[jnp.clip(seg, 0, num_nodes - 1)]
    in_range = (edge_ids < row_splits[num_nodes])[:, None]
    return (grad * in_range.astype(grad.dtype), None)


segment_sum_sorted.defvjp(_seg_sum_fwd, _seg_sum_bwd)


def row_splits_from_sorted_ids(ids: np.ndarray, num_segments: int) -> np.ndarray:
    """Host helper: sorted segment ids -> [num_segments+1] row splits."""
    counts = np.bincount(ids, minlength=num_segments)[:num_segments]
    return np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
