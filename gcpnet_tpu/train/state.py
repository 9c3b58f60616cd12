"""Training state pytree.

Replaces the Lightning module/optimizer wiring with an explicit functional
state: parameters, optax optimizer state, step counter, and a fixed-size
ring buffer of recent gradient norms implementing the reference's adaptive
gradient clipping ("max_norm = 1.5*mean + 2*std of the last 1000 grad
norms", /root/reference/src/models/gcpnet_eq_module.py:556-594) entirely
on-device (no host Queue, no data-dependent control flow).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


class GradNormRing(struct.PyTreeNode):
    """Fixed-size ring buffer of recent gradient norms."""

    buffer: Array  # [capacity]
    count: Array  # scalar int32, total pushes (saturates at capacity)
    head: Array  # scalar int32, next write position

    @classmethod
    def create(cls, capacity: int = 1000) -> "GradNormRing":
        return cls(
            buffer=jnp.zeros((capacity,), jnp.float32),
            count=jnp.zeros((), jnp.int32),
            head=jnp.zeros((), jnp.int32),
        )

    def push(self, value: Array) -> "GradNormRing":
        cap = self.buffer.shape[0]
        buf = self.buffer.at[self.head].set(value)
        return self.replace(
            buffer=buf,
            count=jnp.minimum(self.count + 1, cap),
            head=(self.head + 1) % cap,
        )

    def clip_threshold(self, std_multiplier: float = 2.0) -> Array:
        """1.5*mean + k*std over the filled portion; +inf while empty so the
        first steps are unclipped (matching the reference's warmup of its
        Queue)."""
        cap = self.buffer.shape[0]
        mask = (
            jnp.arange(cap) < self.count
        ).astype(jnp.float32)
        n = jnp.maximum(self.count.astype(jnp.float32), 1.0)
        mean = jnp.sum(self.buffer * mask) / n
        var = jnp.sum(mask * (self.buffer - mean) ** 2) / n
        thr = 1.5 * mean + std_multiplier * jnp.sqrt(var)
        return jnp.where(self.count > 0, thr, jnp.inf)


class TrainState(struct.PyTreeNode):
    step: Array
    params: Any
    opt_state: Any
    grad_norms: Optional[GradNormRing] = None

    @classmethod
    def create(cls, params, tx, adaptive_clip: bool = False) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            grad_norms=GradNormRing.create() if adaptive_clip else None,
        )
