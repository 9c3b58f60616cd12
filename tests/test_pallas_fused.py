"""Fused edge-map + segment-sum kernel vs the plain-XLA reference
(interpret mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcpnet_tpu.ops.pallas_fused import fused_edge_map_segment_sum
from gcpnet_tpu.ops.pallas_segment import row_splits_from_sorted_ids


@pytest.fixture(autouse=True)
def _interpret_on_cpu():
    if jax.default_backend() != "tpu":
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            yield
    else:
        yield


def _mlp(params, chunk):
    # columns: [0:D] features, [D] mask
    d = params["w0"].shape[0]
    x = chunk[:, :d]
    mask = chunk[:, d]
    h = jnp.tanh(x @ params["w0"] + params["b0"])
    y = h @ params["w1"]
    return y * mask[:, None]


def _aligned_layout(ids, n, e_total, tile=128):
    """Mirror of sort_edges_by_receiver's tile-aligned layout: each
    128-node tile's (sorted) edge segment starts at a 128-edge boundary;
    returns (dest positions of the real edges, [n+1] row_splits)."""
    counts = np.bincount(ids, minlength=n)
    n_tiles = (n + tile - 1) // tile
    tile_counts = np.add.reduceat(
        np.pad(counts, (0, n_tiles * tile - n)),
        np.arange(0, n_tiles * tile, tile),
    )
    aligned = ((tile_counts + tile - 1) // tile) * tile
    assert aligned.sum() <= e_total, "test bucket lacks alignment slack"
    tile_starts = np.concatenate([[0], np.cumsum(aligned)[:-1]])
    cum_real = np.concatenate([[0], np.cumsum(tile_counts)[:-1]])
    recv_tile = ids // tile
    within = np.arange(len(ids)) - cum_real[recv_tile]
    dest = tile_starts[recv_tile] + within
    node_tile = np.arange(n) // tile
    splits_within = np.concatenate([[0], np.cumsum(counts)])
    starts = tile_starts[node_tile] + splits_within[:-1] - cum_real[node_tile]
    ends = starts + counts
    splits = np.concatenate([starts, [ends[-1] if n else 0]]).astype(np.int32)
    return dest, splits


def _setup(rng, n, e_real, e_total, d_in, d_hidden, d_out):
    ids = np.sort(rng.integers(0, n, size=e_real)).astype(np.int32)
    x_real = rng.normal(size=(e_real, d_in)).astype(np.float32)
    dest, splits = _aligned_layout(ids, n, e_total)
    x = np.zeros((e_total, d_in), np.float32)
    mask = np.zeros((e_total, 1), np.float32)
    x[dest] = x_real
    mask[dest] = 1.0
    data = np.concatenate([x, mask], axis=-1)
    ids_full = np.zeros(e_total, np.int32)
    ids_full[dest] = ids
    params = {
        "w0": rng.normal(size=(d_in, d_hidden)).astype(np.float32) * 0.3,
        "b0": rng.normal(size=(d_hidden,)).astype(np.float32) * 0.1,
        "w1": rng.normal(size=(d_hidden, d_out)).astype(np.float32) * 0.3,
    }
    return jnp.asarray(data), jnp.asarray(splits), ids_full, dest, params


def _xla_reference(params, data, ids_full, n, d_out):
    y = _mlp(params, data)  # mask column already zeroes padding rows
    return jax.ops.segment_sum(y, jnp.asarray(ids_full), num_segments=n)


@pytest.mark.parametrize(
    "n,e_real,e_total", [(10, 90, 128), (130, 600, 768), (7, 5, 256)]
)
def test_fused_forward_matches_reference(rng, n, e_real, e_total):
    d_in, d_hidden, d_out = 12, 16, 9
    data, splits, ids_full, dest, params = _setup(
        rng, n, e_real, e_total, d_in, d_hidden, d_out
    )
    out = fused_edge_map_segment_sum(_mlp, params, data, splits, n, d_out)
    expected = _xla_reference(params, data, ids_full, n, d_out)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), atol=1e-4
    )


def test_fused_grads_match_reference(rng):
    n, e_real, e_total = 20, 150, 256
    d_in, d_hidden, d_out = 8, 16, 6
    data, splits, ids_full, dest, params = _setup(
        rng, n, e_real, e_total, d_in, d_hidden, d_out
    )
    cot = jnp.asarray(rng.normal(size=(n, d_out)).astype(np.float32))

    def loss_fused(p, d):
        out = fused_edge_map_segment_sum(_mlp, p, d, splits, n, d_out)
        return jnp.sum(out * cot)

    def loss_ref(p, d):
        return jnp.sum(_xla_reference(p, d, ids_full, n, d_out) * cot)

    (dp_f, dd_f) = jax.grad(loss_fused, argnums=(0, 1))(params, data)
    (dp_r, dd_r) = jax.grad(loss_ref, argnums=(0, 1))(params, data)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4
        ),
        dp_f,
        dp_r,
    )
    dd_f, dd_r = np.asarray(dd_f), np.asarray(dd_r)
    np.testing.assert_allclose(dd_f[dest], dd_r[dest], atol=1e-4)
    # data-column grads of padding rows (outside every segment) must be
    # exactly zero — the in-fn mask multiply kills them.  (The mask column
    # itself may carry a gradient on alignment-hole rows; callers pass mask
    # columns under stop_gradient.)
    pad_rows = np.setdiff1d(np.arange(e_total), dest)
    assert np.all(dd_f[pad_rows][:, :-1] == 0.0)


def test_fused_under_jit_and_vmap_free_shapes(rng):
    # num_nodes exactly a tile multiple exercises the no-fake-tile branch
    n, e_real, e_total = 128, 500, 512
    d_in, d_hidden, d_out = 4, 8, 3
    data, splits, ids_full, dest, params = _setup(
        rng, n, e_real, e_total, d_in, d_hidden, d_out
    )

    @jax.jit
    def f(p, d):
        return fused_edge_map_segment_sum(_mlp, p, d, splits, n, d_out)

    out = f(params, data)
    expected = _xla_reference(params, data, ids_full, n, d_out)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), atol=1e-4
    )
