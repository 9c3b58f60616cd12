"""Geometric feature primitives.

TPU-native re-design of the reference's scalar/vector feature machinery
(/root/reference/src/models/components/__init__.py:17-167,381-416): the
``ScalarVector`` pair becomes a registered pytree so it can flow through
``jit``/``grad``/``scan``; all helpers are pure functions of arrays.

Layout convention — PACKED vectors: a ``c``-channel 3-vector feature is
stored flat as ``[..., 3*c]`` with axis-major blocks ``[x-block | y-block |
z-block]`` (each block ``c`` wide).  Rationale: TPU tiles the two minor
dims to (8, 128); any ``[..., c, 3]`` layout pads the xyz axis 3 -> 128
lanes, inflating every stored vector tensor (and every gather/scatter/copy
of it) by up to ~40x in HBM.  Profiling the LBA train step showed those
padded copies + gathers + tiny batched dots dominating the step (~80% of
device time).  Packed-flat tensors are ordinary 2-D rows — gathers,
scatters, concats and matmuls all run at full lane utilization, and the
channel-mixing linear map becomes three shared-weight ``[.., c] @ [c, h]``
matmuls.

``pack_vector``/``unpack_vector`` convert at the host/model boundary
(GraphBatch keeps the public ``[N, m, 3]`` layout).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def pack_vector(v: Array) -> Array:
    """``[..., c, 3] -> [..., 3c]`` with x/y/z axis-major blocks."""
    moved = jnp.moveaxis(v, -1, -2)  # [..., 3, c]
    return moved.reshape(*v.shape[:-2], 3 * v.shape[-2])


def unpack_vector(vp: Array) -> Array:
    """``[..., 3c] -> [..., c, 3]``."""
    c = vp.shape[-1] // 3
    moved = vp.reshape(*vp.shape[:-1], 3, c)
    return jnp.moveaxis(moved, -2, -1)


def vec_channels(vp: Array) -> int:
    return vp.shape[-1] // 3


def vec_components(vp: Array):
    """The three ``[..., c]`` axis blocks."""
    c = vp.shape[-1] // 3
    return vp[..., :c], vp[..., c : 2 * c], vp[..., 2 * c :]


def vec_from_components(x: Array, y: Array, z: Array) -> Array:
    return jnp.concatenate([x, y, z], axis=-1)


def vec_at(vp: Array, channel: int) -> Array:
    """One channel's 3-vector ``[..., 3]`` (for position heads)."""
    c = vp.shape[-1] // 3
    return jnp.stack(
        [vp[..., channel], vp[..., c + channel], vp[..., 2 * c + channel]],
        axis=-1,
    )


def vec_sq_norm(vp: Array) -> Array:
    """Per-channel squared L2 over xyz: ``[..., 3c] -> [..., c]``."""
    x, y, z = vec_components(vp)
    return x * x + y * y + z * z


class ScalarVector(NamedTuple):
    """Paired invariant scalar and equivariant vector feature channels.

    ``scalar``: [..., ds]; ``vector``: PACKED [..., 3*dv].  NamedTuple =>
    pytree.  Mirrors reference components/__init__.py:17-94.
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
        xs, ys, zs = [], [], []
        for it in items:
            x, y, z = vec_components(it[1])
            xs.append(x)
            ys.append(y)
            zs.append(z)
        return ScalarVector(
            jnp.concatenate([it[0] for it in items], axis=-1),
            jnp.concatenate(xs + ys + zs, axis=-1),
        )

    def flatten(self) -> Array:
        """[..., ds] ++ [..., 3*dv] -> [..., ds + 3*dv] (packed order)."""
        return jnp.concatenate([self.scalar, self.vector], axis=-1)

    @staticmethod
    def recover(x: Array, vector_dim: int) -> "ScalarVector":
        """Inverse of :meth:`flatten`."""
        if vector_dim == 0:
            return ScalarVector(x, jnp.zeros(x.shape[:-1] + (0,), x.dtype))
        return ScalarVector(
            x[..., : -3 * vector_dim], x[..., -3 * vector_dim :]
        )

    def idx(self, indices) -> "ScalarVector":
        return ScalarVector(self.scalar[indices], self.vector[indices])

    def mask(self, node_mask: Array) -> "ScalarVector":
        m = node_mask.astype(self.scalar.dtype)
        return ScalarVector(self.scalar * m[:, None], self.vector * m[:, None])

    @property
    def dims(self):
        return self.scalar.shape[-1], self.vector.shape[-1] // 3


def safe_norm(
    x: Array, axis: int = -1, keepdims: bool = False, eps: float = 1e-8, sqrt: bool = True
) -> Array:
    """sqrt(sum(x^2) + eps) + eps — reference components/__init__.py:381-392."""
    norm = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    if sqrt:
        norm = jnp.sqrt(norm + eps)
    return norm + eps


def safe_vec_norm(vp: Array, eps: float = 1e-8) -> Array:
    """Packed per-channel safe norm: ``[..., 3c] -> [..., c]``."""
    return jnp.sqrt(vec_sq_norm(vp) + eps) + eps


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


def norm_vector_channels(vp: Array, eps: float = 1e-8) -> Array:
    """Nonparametric vector normalization on packed vectors: divide by the
    RMS (over channels) of each channel's clamped squared L2 norm
    (reference components/__init__.py:149-153)."""
    sq = jnp.maximum(vec_sq_norm(vp), eps)  # [..., c]
    denom = jnp.sqrt(jnp.mean(sq, axis=-1, keepdims=True))  # [..., 1]
    return vp / denom


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
            if x.vector.shape[-1] == 0:
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
            c = x.vector.shape[-1] // 3
            mask = jax.random.bernoulli(
                rng, keep, shape=x.vector.shape[:-1] + (c,)
            ).astype(x.vector.dtype)
            v = x.vector * jnp.tile(mask, (1,) * (x.vector.ndim - 1) + (3,)) / keep
            return ScalarVector(s, v)
        return nn.Dropout(self.rate, deterministic=False, name="scalar_dropout")(x)


class VectorLinear(nn.Module):
    """Bias-free channel-mixing linear map over packed vector channels:
    ``[..., 3*din] -> [..., 3*dout]``.  Equivariant because the same kernel
    acts on each xyz block.  Matches ``nn.Linear(din, dout, bias=False)``
    applied to the reference's transposed ``[*, 3, din]`` layout."""

    features: int
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, vp: Array) -> Array:
        din = vp.shape[-1] // 3
        kernel = self.param("kernel", self.kernel_init, (din, self.features))
        x, y, z = vec_components(vp)
        return jnp.concatenate([x @ kernel, y @ kernel, z @ kernel], axis=-1)
