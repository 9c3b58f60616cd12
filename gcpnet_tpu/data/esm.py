"""ESM-2 residue embeddings for the EQ/AR pipelines.

The reference loads ESM-2 650M via torch.hub in the datamodule constructor
(/root/reference/src/datamodules/eq_datamodule.py:52-54) and embeds each
decoy's sequence on the fly.  Here embeddings are a host preprocessing
concern with three tiers:

  1. a cached ``<sha1(seq)>.npy`` under the embedding cache dir (populated
     by ``scripts/precompute_esm_embeddings.py`` on a machine with
     fair-esm),
  2. live fair-esm if importable,
  3. a deterministic zero tensor (documented degraded mode for
     environments without the model weights).
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


def embed_sequence(
    seq: str, cache_dir: Optional[str] = None
) -> np.ndarray:
    """[len(seq), 1280] residue embeddings."""
    global _warned
    if cache_dir:
        path = os.path.join(cache_dir, _seq_key(seq) + ".npy")
        if os.path.exists(path):
            return np.load(path)
    emb = _try_live_esm(seq)
    if emb is not None:
        if cache_dir:
            os.makedirs(cache_dir, exist_ok=True)
            np.save(os.path.join(cache_dir, _seq_key(seq) + ".npy"), emb)
        return emb
    if not _warned:
        log.warning(
            "fair-esm unavailable and no cached embedding found — using "
            "zero embeddings (precompute with "
            "scripts/precompute_esm_embeddings.py for full fidelity)"
        )
        _warned = True
    return np.zeros((len(seq), ESM_EMBEDDING_DIM), dtype=np.float32)
