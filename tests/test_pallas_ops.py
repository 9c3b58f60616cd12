"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcpnet_tpu.ops.pallas_segment import (
    row_splits_from_sorted_ids,
    segment_sum_sorted,
)


def _reference(data, ids, n):
    return jax.ops.segment_sum(data, ids, num_segments=n)


@pytest.fixture(autouse=True)
def _interpret_on_cpu(monkeypatch):
    if jax.default_backend() != "tpu":
        from jax.experimental.pallas import tpu as pltpu

        ctx = pltpu.force_tpu_interpret_mode()
        ctx.__enter__()
        yield
        ctx.__exit__(None, None, None)
    else:
        yield


@pytest.mark.parametrize("n,e,d", [(10, 64, 8), (130, 700, 20), (5, 3, 148)])
def test_segment_sum_sorted_matches_reference(rng, n, e, d):
    ids = np.sort(rng.integers(0, n, size=e)).astype(np.int32)
    data = rng.normal(size=(e, d)).astype(np.float32)
    splits = row_splits_from_sorted_ids(ids, n)
    out = segment_sum_sorted(jnp.asarray(data), jnp.asarray(splits), n)
    expected = _reference(jnp.asarray(data), jnp.asarray(ids), n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-4)


def test_segment_sum_sorted_with_padding_edges(rng):
    n, e_real, d = 12, 40, 16
    ids = np.sort(rng.integers(0, n, size=e_real)).astype(np.int32)
    data_real = rng.normal(size=(e_real, d)).astype(np.float32)
    # padding edges appended after all real edges: must not contribute
    pad = rng.normal(size=(8, d)).astype(np.float32)
    data = np.concatenate([data_real, pad])
    splits = row_splits_from_sorted_ids(ids, n)
    out = segment_sum_sorted(jnp.asarray(data), jnp.asarray(splits), n)
    expected = _reference(jnp.asarray(data_real), jnp.asarray(ids), n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-4)


def test_segment_sum_sorted_grad(rng):
    n, e, d = 9, 50, 12
    ids = np.sort(rng.integers(0, n, size=e)).astype(np.int32)
    data = jnp.asarray(rng.normal(size=(e, d)).astype(np.float32))
    splits = jnp.asarray(row_splits_from_sorted_ids(ids, n))
    w = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))

    def loss_pallas(x):
        return jnp.sum(segment_sum_sorted(x, splits, n) * w)

    def loss_ref(x):
        return jnp.sum(_reference(x, jnp.asarray(ids), n) * w)

    g_pallas = jax.grad(loss_pallas)(data)
    g_ref = jax.grad(loss_ref)(data)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_ref), atol=1e-4)
