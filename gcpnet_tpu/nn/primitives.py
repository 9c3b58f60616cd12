"""Geometric feature primitives.

TPU-native re-design of the reference's scalar/vector feature machinery
(/root/reference/src/models/components/__init__.py:17-167,381-416): the
``ScalarVector`` pair becomes a registered pytree so it can flow through
``jit``/``grad``/``scan``; all helpers are pure functions of arrays.

Layout convention: scalars ``[..., ds]``, vectors ``[..., dv, 3]`` with the
Cartesian axis last (matches the reference's public layout; the reference's
internal ``[*, 3, dv]`` transposes are not needed — channel-mixing linear
maps are expressed as einsums over the channel axis directly, which XLA maps
onto the MXU with the ``... * 3`` product as the batch dimension).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class ScalarVector(NamedTuple):
    """Paired invariant scalar and equivariant vector feature channels.

    ``scalar``: [..., ds]; ``vector``: [..., dv, 3].  NamedTuple => pytree.
    Mirrors reference components/__init__.py:17-94.
    """

    scalar: Array
    vector: Array

    def __add__(self, other):  # type: ignore[override]
        return ScalarVector(self.scalar + other[0], self.vector + other[1])

    def __mul__(self, other):  # type: ignore[override]
        if isinstance(other, (tuple, ScalarVector)):
            return ScalarVector(self.scalar * other[0], self.vector * other[1])
        return ScalarVector(self.scalar * other, self.vector * other)

    def concat(self, others) -> "ScalarVector":
        items = (self, *others)
        return ScalarVector(
            jnp.concatenate([it[0] for it in items], axis=-1),
            jnp.concatenate([it[1] for it in items], axis=-2),
        )

    def flatten(self) -> Array:
        """[..., ds] + [..., dv, 3] -> [..., ds + 3*dv]."""
        v = self.vector
        flat = v.reshape(v.shape[:-2] + (v.shape[-2] * 3,))
        return jnp.concatenate([self.scalar, flat], axis=-1)

    @staticmethod
    def recover(x: Array, vector_dim: int) -> "ScalarVector":
        """Inverse of :meth:`flatten`."""
        if vector_dim == 0:
            return ScalarVector(x, jnp.zeros(x.shape[:-1] + (0, 3), x.dtype))
        v = x[..., -3 * vector_dim :].reshape(x.shape[:-1] + (vector_dim, 3))
        return ScalarVector(x[..., : -3 * vector_dim], v)

    def idx(self, indices) -> "ScalarVector":
        return ScalarVector(self.scalar[indices], self.vector[indices])

    def mask(self, node_mask: Array) -> "ScalarVector":
        m = node_mask.astype(self.scalar.dtype)
        return ScalarVector(self.scalar * m[:, None], self.vector * m[:, None, None])

    @property
    def dims(self):
        return self.scalar.shape[-1], self.vector.shape[-2]


def safe_norm(
    x: Array, axis: int = -1, keepdims: bool = False, eps: float = 1e-8, sqrt: bool = True
) -> Array:
    """sqrt(sum(x^2) + eps) + eps — reference components/__init__.py:381-392."""
    norm = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    if sqrt:
        norm = jnp.sqrt(norm + eps)
    return norm + eps


def norm_no_nan(
    x: Array, axis: int = -1, keepdims: bool = False, eps: float = 1e-8, sqrt: bool = True
) -> Array:
    """Clamped L2 norm — reference components/__init__.py:400-416."""
    out = jnp.maximum(jnp.sum(x * x, axis=axis, keepdims=keepdims), eps)
    return jnp.sqrt(out) if sqrt else out


def get_nonlinearity(
    name: Optional[str], slope: float = 0.01
) -> Callable[[Array], Array]:
    """Name -> activation fn (reference src/models/__init__.py:42-57)."""
    if name is None or name == "" or name == "none":
        return lambda x: x
    table = {
        "relu": jax.nn.relu,
        "leakyrelu": lambda x: jax.nn.leaky_relu(x, negative_slope=slope),
        "selu": jax.nn.selu,
        "silu": jax.nn.silu,
        "swish": jax.nn.silu,
        "gelu": jax.nn.gelu,
        "sigmoid": jax.nn.sigmoid,
        "tanh": jnp.tanh,
    }
    if name not in table:
        raise NotImplementedError(f"nonlinearity '{name}' is not supported")
    return table[name]


def is_identity(name: Optional[str]) -> bool:
    return name is None or name == "" or name == "none"


def norm_vector_channels(v: Array, eps: float = 1e-8) -> Array:
    """Nonparametric vector normalization: divide by the RMS (over channels)
    of each channel's clamped squared L2 norm
    (reference components/__init__.py:149-153)."""
    sq = jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), eps)
    denom = jnp.sqrt(jnp.mean(sq, axis=-2, keepdims=True))
    return v / denom


class GCPLayerNorm(nn.Module):
    """Scalar LayerNorm (learned affine) + nonparametric vector norm
    (reference components/__init__.py:138-167)."""

    eps: float = 1e-8

    @nn.compact
    def __call__(
        self, x: Union[Array, ScalarVector]
    ) -> Union[Array, ScalarVector]:
        if isinstance(x, ScalarVector):
            s = nn.LayerNorm(name="scalar_norm")(x.scalar)
            if x.vector.shape[-2] == 0:
                return ScalarVector(s, x.vector)
            return ScalarVector(s, norm_vector_channels(x.vector, eps=self.eps))
        return nn.LayerNorm(name="scalar_norm")(x)


class GCPDropout(nn.Module):
    """Paired scalar dropout and row-wise vector-channel dropout: entire
    3-vectors are dropped together (reference components/__init__.py:97-135)."""

    rate: float

    @nn.compact
    def __call__(
        self, x: Union[Array, ScalarVector], deterministic: bool
    ) -> Union[Array, ScalarVector]:
        if self.rate == 0.0 or deterministic:
            return x
        if isinstance(x, ScalarVector):
            s = nn.Dropout(self.rate, deterministic=False, name="scalar_dropout")(
                x.scalar
            )
            keep = 1.0 - self.rate
            rng = self.make_rng("dropout")
            mask = jax.random.bernoulli(rng, keep, shape=x.vector.shape[:-1])
            v = x.vector * mask[..., None].astype(x.vector.dtype) / keep
            return ScalarVector(s, v)
        return nn.Dropout(self.rate, deterministic=False, name="scalar_dropout")(x)


class VectorLinear(nn.Module):
    """Bias-free channel-mixing linear map over vector channels:
    ``[..., din, 3] -> [..., dout, 3]``.  Equivariant because it acts only on
    the channel axis.  Matches ``nn.Linear(din, dout, bias=False)`` applied
    to the reference's transposed ``[*, 3, din]`` layout."""

    features: int
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, v: Array) -> Array:
        din = v.shape[-2]
        kernel = self.param("kernel", self.kernel_init, (din, self.features))
        return jnp.einsum("...dx,dh->...hx", v, kernel)
