"""ESM-2 residue embeddings for the EQ/AR pipelines.

The reference loads ESM-2 650M via torch.hub in the datamodule constructor
(/root/reference/src/datamodules/eq_datamodule.py:52-54) and embeds each
decoy's sequence on the fly.  Here embeddings are a host preprocessing
concern with three tiers:

  1. a cached ``<sha1(seq)>.npy`` under the embedding cache dir (populated
     by ``scripts/precompute_esm_embeddings.py``),
  2. the native flax ESM-2 (gcpnet_tpu.nn.esm) when a checkpoint is
     available — point ``GCPNET_ESM_CHECKPOINT`` at a fair-esm ``.pt``,
     a converted ``.npz`` (scripts/convert_esm_checkpoint.py), or a HF
     model directory,
  3. live fair-esm if importable,
  4. a deterministic zero tensor (documented degraded mode; set
     ``GCPNET_REQUIRE_ESM=1`` to make this an error so no reported run
     silently trains on zero embeddings).
"""

from __future__ import annotations

import hashlib
import os
from typing import Optional

import numpy as np

from gcpnet_tpu.utils.pylogger import get_pylogger

log = get_pylogger(__name__)

ESM_EMBEDDING_DIM = 1280

_esm_model = None
_esm_alphabet = None
_jax_esm = None  # (params, cfg) | False once load failed
_warned = False


def _seq_key(seq: str) -> str:
    return hashlib.sha1(seq.encode()).hexdigest()


def _try_live_esm(seq: str) -> Optional[np.ndarray]:
    global _esm_model, _esm_alphabet
    try:
        import torch

        if _esm_model is None:
            import esm  # fair-esm

            _esm_model, _esm_alphabet = esm.pretrained.esm2_t33_650M_UR50D()
            _esm_model.eval()
        converter = _esm_alphabet.get_batch_converter()
        _, _, tokens = converter([("seq", seq)])
        with torch.no_grad():
            out = _esm_model(tokens, repr_layers=[33])
        rep = out["representations"][33][0, 1 : len(seq) + 1]
        return rep.numpy().astype(np.float32)
    except Exception:
        return None


def _try_jax_esm(seq: str) -> Optional[np.ndarray]:
    """Native flax ESM-2 (gcpnet_tpu.nn.esm) from GCPNET_ESM_CHECKPOINT."""
    global _jax_esm
    if _jax_esm is False:
        return None
    if _jax_esm is None:
        ckpt = os.environ.get("GCPNET_ESM_CHECKPOINT")
        if not ckpt or not os.path.exists(ckpt):
            _jax_esm = False
            return None
        try:
            from gcpnet_tpu.utils.esm_convert import load_checkpoint

            _jax_esm = load_checkpoint(ckpt)
            log.info("loaded native ESM-2 checkpoint from %s", ckpt)
        except Exception as exc:
            log.warning("failed to load ESM checkpoint %s: %s", ckpt, exc)
            _jax_esm = False
            return None
    from gcpnet_tpu.nn.esm import embed_sequence_jax

    params, cfg = _jax_esm
    return embed_sequence_jax(params, cfg, seq).astype(np.float32)


def embed_sequence(
    seq: str, cache_dir: Optional[str] = None
) -> np.ndarray:
    """[len(seq), 1280] residue embeddings."""
    global _warned
    if cache_dir:
        path = os.path.join(cache_dir, _seq_key(seq) + ".npy")
        if os.path.exists(path):
            return np.load(path)
    emb = _try_jax_esm(seq)
    if emb is None:
        emb = _try_live_esm(seq)
    if emb is not None:
        if cache_dir:
            os.makedirs(cache_dir, exist_ok=True)
            np.save(os.path.join(cache_dir, _seq_key(seq) + ".npy"), emb)
        return emb
    if os.environ.get("GCPNET_REQUIRE_ESM"):
        raise RuntimeError(
            "GCPNET_REQUIRE_ESM is set but no ESM embedding source is "
            "available (no cache hit, no GCPNET_ESM_CHECKPOINT, no fair-esm)"
        )
    if not _warned:
        log.warning(
            "no ESM source available — using zero embeddings (set "
            "GCPNET_ESM_CHECKPOINT to an ESM-2 checkpoint, or precompute "
            "with scripts/precompute_esm_embeddings.py; set "
            "GCPNET_REQUIRE_ESM=1 to forbid this degraded mode)"
        )
        _warned = True
    return np.zeros((len(seq), ESM_EMBEDDING_DIM), dtype=np.float32)
