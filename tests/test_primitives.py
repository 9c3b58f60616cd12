"""Unit tests for scalar/vector primitives and masked segment ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcpnet_tpu.nn.primitives import (
    ScalarVector,
    norm_no_nan,
    norm_vector_channels,
    pack_vector,
    safe_norm,
    unpack_vector,
    vec_at,
    vec_components,
)
from gcpnet_tpu.ops.segment import masked_mean, segment_mean, segment_sum


def test_scalar_vector_roundtrip(rng):
    s = jnp.asarray(rng.normal(size=(7, 5)).astype(np.float32))
    v3 = rng.normal(size=(7, 4, 3)).astype(np.float32)
    v = pack_vector(jnp.asarray(v3))
    assert v.shape == (7, 12)
    np.testing.assert_allclose(unpack_vector(v), v3)
    # packed block semantics: x-block first
    np.testing.assert_allclose(np.asarray(v)[:, :4], v3[:, :, 0])
    np.testing.assert_allclose(np.asarray(vec_at(v, 2)), v3[:, 2, :])
    sv = ScalarVector(s, v)
    flat = sv.flatten()
    assert flat.shape == (7, 5 + 12)
    back = ScalarVector.recover(flat, 4)
    np.testing.assert_allclose(back.scalar, s)
    np.testing.assert_allclose(back.vector, v)


def test_scalar_vector_arith(rng):
    s = jnp.ones((3, 2))
    v3 = rng.normal(size=(3, 2, 3)).astype(np.float32)
    v = pack_vector(jnp.asarray(v3))
    sv = ScalarVector(s, v)
    out = sv + sv
    np.testing.assert_allclose(out.scalar, 2 * s)
    out = sv * 3.0
    np.testing.assert_allclose(out.vector, 3 * v)
    cat = sv.concat((sv,))
    assert cat.scalar.shape == (3, 4) and cat.vector.shape == (3, 12)
    # concat interleaves per-axis blocks so unpack gives channel concat
    np.testing.assert_allclose(
        unpack_vector(cat.vector), np.concatenate([v3, v3], axis=1)
    )


def test_safe_norm_matches_reference_formula(rng):
    x = jnp.asarray(rng.normal(size=(5, 4)).astype(np.float32))
    expected = np.sqrt((np.asarray(x) ** 2).sum(-1) + 1e-8) + 1e-8
    np.testing.assert_allclose(safe_norm(x), expected, rtol=1e-6)
    # norm_no_nan clamps below
    z = jnp.zeros((2, 3))
    assert float(norm_no_nan(z)[0]) == pytest.approx(np.sqrt(1e-8))


def test_segment_mean_torch_scatter_semantics():
    data = jnp.asarray([[1.0], [3.0], [5.0], [100.0]])
    ids = jnp.asarray([0, 0, 1, 2])
    mask = jnp.asarray([True, True, True, False])
    out = segment_mean(data, ids, 4, mask=mask)
    # segment 0: mean(1,3)=2; segment 1: 5; segment 2 masked -> 0; 3 empty -> 0
    np.testing.assert_allclose(np.asarray(out)[:, 0], [2.0, 5.0, 0.0, 0.0])


def test_segment_mean_separate_count_mask():
    data = jnp.asarray([[4.0], [8.0]])
    ids = jnp.asarray([0, 0])
    num_mask = jnp.asarray([True, False])
    den_mask = jnp.asarray([True, True])
    out = segment_mean(data, ids, 1, mask=num_mask, count_mask=den_mask)
    # numerator 4, denominator 2 (reference masked-scalarize semantics)
    assert float(out[0, 0]) == pytest.approx(2.0)


def test_segment_sum_mask():
    data = jnp.ones((4, 2))
    ids = jnp.asarray([0, 0, 1, 1])
    mask = jnp.asarray([True, False, True, True])
    out = segment_sum(data, ids, 2, mask=mask)
    np.testing.assert_allclose(np.asarray(out), [[1, 1], [2, 2]])


def test_masked_mean():
    x = jnp.asarray([[1.0, 2.0], [3.0, 4.0], [100.0, 100.0]])
    m = jnp.asarray([True, True, False])
    np.testing.assert_allclose(np.asarray(masked_mean(x, m, axis=0)), [2.0, 3.0])


def test_norm_vector_channels_zero_safe():
    v = jnp.zeros((3, 12))
    out = norm_vector_channels(v)
    assert np.isfinite(np.asarray(out)).all()
