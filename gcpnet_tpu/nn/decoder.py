"""Direct-shot CPD decoder head.

Re-design of ``GCPMLPDecoder`` (/root/reference/src/models/components/
gcpnet.py:1454-1491): a linear stack (optionally with residual updates)
producing per-node vocabulary logits and log-probs.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gcpnet_tpu.nn.gcp import Dense

Array = jax.Array


class GCPMLPDecoder(nn.Module):
    hidden_dim: int
    vocab_size: int = 20
    num_layers: int = 1
    residual_updates: bool = False

    @nn.compact
    def __call__(self, h: Array) -> Tuple[Array, Array]:
        x = h
        for i in range(self.num_layers - 1):
            layer = Dense(self.hidden_dim, name=f"readout_{i}")
            x = x + layer(x) if self.residual_updates else layer(x)
        logits = Dense(self.vocab_size, name=f"readout_{self.num_layers - 1}")(x)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        return logits, log_probs
