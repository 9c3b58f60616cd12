"""ESM-2 protein language model, TPU-native (flax).

The reference consumes ESM-2 650M residue embeddings via torch.hub + fair-esm
(/root/reference/src/datamodules/eq_datamodule.py:52-54,
eq_dataset.py:329-340).  This is an independent flax implementation of the
published ESM-2 architecture (Lin et al. 2023): pre-LN transformer encoder
with rotary position embeddings on q/k (full head dim), exact-erf GELU FFN,
query pre-scaling, mask-token "token dropout" rescaling, and a final
embedding layer norm.  Weights load from fair-esm ``.pt`` checkpoints or
HuggingFace ESM directories via :func:`gcpnet_tpu.utils.esm_convert`.

Batched over sequences with a padding mask; the whole forward jits onto the
MXU (the [T, D] x [D, D] projections dominate).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array

# ESM alphabet (fair-esm standard ordering; reference eq_dataset tokenizes
# through the same alphabet object)
ESM_TOKENS = [
    "<cls>", "<pad>", "<eos>", "<unk>",
    "L", "A", "G", "V", "S", "E", "R", "T", "I", "D", "P", "K",
    "Q", "N", "F", "Y", "M", "H", "W", "C", "X", "B", "U", "Z", "O",
    ".", "-", "<null_1>", "<mask>",
]
TOKEN_TO_ID = {t: i for i, t in enumerate(ESM_TOKENS)}
CLS_ID, PAD_ID, EOS_ID, UNK_ID = 0, 1, 2, 3
MASK_ID = TOKEN_TO_ID["<mask>"]
MASK_RATIO_TRAIN = 0.15 * 0.8


@dataclasses.dataclass(frozen=True)
class ESM2Config:
    num_layers: int = 33
    embed_dim: int = 1280
    num_heads: int = 20
    vocab_size: int = 33
    token_dropout: bool = True
    layer_norm_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @classmethod
    def t6_8M(cls):
        return cls(num_layers=6, embed_dim=320, num_heads=20)

    @classmethod
    def t12_35M(cls):
        return cls(num_layers=12, embed_dim=480, num_heads=20)

    @classmethod
    def t30_150M(cls):
        return cls(num_layers=30, embed_dim=640, num_heads=20)

    @classmethod
    def t33_650M(cls):
        return cls(num_layers=33, embed_dim=1280, num_heads=20)


def tokenize(seq: str) -> np.ndarray:
    """``<cls> seq <eos>`` token ids (unknown residues -> X)."""
    ids = [CLS_ID]
    for ch in seq:
        ids.append(TOKEN_TO_ID.get(ch.upper(), TOKEN_TO_ID["X"]))
    ids.append(EOS_ID)
    return np.asarray(ids, dtype=np.int32)


def _rope_tables(seq_len: int, head_dim: int, dtype) -> Tuple[Array, Array]:
    inv_freq = 1.0 / (
        10000 ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    t = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)           # [T, head_dim/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [T, head_dim]
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_half(x: Array) -> Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _apply_rope(x: Array, cos: Array, sin: Array) -> Array:
    # x: [B, H, T, hd]; cos/sin: [T, hd]
    return x * cos[None, None] + _rotate_half(x) * sin[None, None]


class _SelfAttention(nn.Module):
    cfg: ESM2Config

    @nn.compact
    def __call__(self, x: Array, pad_mask: Array) -> Array:
        cfg = self.cfg
        B, T, D = x.shape
        H, hd = cfg.num_heads, cfg.head_dim

        def heads(name):
            y = nn.Dense(D, name=name)(x)
            return y.reshape(B, T, H, hd).transpose(0, 2, 1, 3)

        # ESM scales the *query* by 1/sqrt(head_dim) before RoPE (order
        # matters with rotary embeddings)
        q = heads("q_proj") * (1.0 / np.sqrt(hd))
        k = heads("k_proj")
        v = heads("v_proj")

        cos, sin = _rope_tables(T, hd, x.dtype)
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)

        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k)
        neg = jnp.finfo(x.dtype).min
        logits = jnp.where(pad_mask[:, None, None, :], logits, neg)
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
        return nn.Dense(D, name="out_proj")(out)


class _TransformerLayer(nn.Module):
    cfg: ESM2Config

    @nn.compact
    def __call__(self, x: Array, pad_mask: Array) -> Array:
        cfg = self.cfg
        ln = dict(epsilon=cfg.layer_norm_eps)
        residual = x
        x = nn.LayerNorm(name="self_attn_layer_norm", **ln)(x)
        x = residual + _SelfAttention(cfg, name="self_attn")(x, pad_mask)

        residual = x
        x = nn.LayerNorm(name="final_layer_norm", **ln)(x)
        x = nn.Dense(4 * cfg.embed_dim, name="fc1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(cfg.embed_dim, name="fc2")(x)
        return residual + x


class ESM2(nn.Module):
    """Returns final-layer representations ``[B, T, D]`` over tokens."""

    cfg: ESM2Config

    @nn.compact
    def __call__(self, tokens: Array) -> Array:
        cfg = self.cfg
        pad_mask = tokens != PAD_ID
        x = nn.Embed(cfg.vocab_size, cfg.embed_dim, name="embed_tokens")(tokens)

        if cfg.token_dropout:
            # mask-token dropout compensation (fair-esm esm2.py semantics)
            is_mask = (tokens == MASK_ID)[..., None]
            x = jnp.where(is_mask, 0.0, x)
            src_len = jnp.sum(pad_mask, axis=-1)
            mask_ratio_obs = (
                jnp.sum(tokens == MASK_ID, axis=-1) / jnp.maximum(src_len, 1)
            )
            scale = (1.0 - MASK_RATIO_TRAIN) / (1.0 - mask_ratio_obs)
            x = x * scale[:, None, None]

        x = x * pad_mask[..., None].astype(x.dtype)
        for i in range(cfg.num_layers):
            x = _TransformerLayer(cfg, name=f"layers_{i}")(x, pad_mask)
        x = nn.LayerNorm(
            name="emb_layer_norm_after", epsilon=cfg.layer_norm_eps
        )(x)
        return x


def embed_tokens_batch(
    params, cfg: ESM2Config, tokens: np.ndarray
) -> np.ndarray:
    """Jitted batched forward; returns per-token representations."""
    model = ESM2(cfg)

    @jax.jit
    def run(tok):
        return model.apply(params, tok)

    return np.asarray(run(jnp.asarray(tokens)))


def embed_sequence_jax(params, cfg: ESM2Config, seq: str) -> np.ndarray:
    """[len(seq), D] residue embeddings (cls/eos stripped)."""
    tokens = tokenize(seq)[None]
    reps = embed_tokens_batch(params, cfg, tokens)
    return reps[0, 1 : len(seq) + 1]
