"""Convert pretrained ESM-2 checkpoints into gcpnet_tpu.nn.esm flax params.

Supports both public weight formats:
  * fair-esm ``.pt`` torch.hub checkpoints (the reference's source,
    /root/reference/src/datamodules/eq_datamodule.py:52-54), and
  * HuggingFace ``transformers`` ESM state dicts / model directories.

Converted params can be saved as ``.npz`` (scripts/convert_esm_checkpoint.py)
and loaded without torch at training time.
"""

from __future__ import annotations

import io
import os
import re
from typing import Dict, Mapping, Tuple

import numpy as np

from gcpnet_tpu.nn.esm import ESM2Config


def _set(params: Dict, path, leaf, value):
    node = params
    for tok in path:
        node = node.setdefault(tok, {})
    node[leaf] = value


def _linear(params, path, name, w, b):
    _set(params, path + [name], "kernel", np.asarray(w).T)
    if b is not None:
        _set(params, path + [name], "bias", np.asarray(b))


def _ln(params, path, name, w, b):
    _set(params, path + [name], "scale", np.asarray(w))
    _set(params, path + [name], "bias", np.asarray(b))


def from_fairesm_state_dict(sd: Mapping[str, np.ndarray]) -> Tuple[Dict, ESM2Config]:
    """fair-esm ESM2 module state dict -> (flax params, config)."""
    sd = {k.removeprefix("encoder.").removeprefix("sentence_encoder."): v
          for k, v in sd.items()}
    embed = np.asarray(sd["embed_tokens.weight"])
    layer_ids = sorted(
        {int(m.group(1)) for k in sd if (m := re.match(r"layers\.(\d+)\.", k))}
    )
    dim = embed.shape[1]
    # infer head count from the published family dims (all use 20 heads)
    cfg = ESM2Config(num_layers=len(layer_ids), embed_dim=dim,
                     num_heads=20, vocab_size=embed.shape[0])

    params: Dict = {}
    _set(params, ["embed_tokens"], "embedding", embed)
    for i in layer_ids:
        p = f"layers.{i}."
        lp = [f"layers_{i}"]
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _linear(params, lp + ["self_attn"], proj,
                    sd[p + f"self_attn.{proj}.weight"],
                    sd.get(p + f"self_attn.{proj}.bias"))
        _ln(params, lp, "self_attn_layer_norm",
            sd[p + "self_attn_layer_norm.weight"],
            sd[p + "self_attn_layer_norm.bias"])
        _linear(params, lp, "fc1", sd[p + "fc1.weight"], sd[p + "fc1.bias"])
        _linear(params, lp, "fc2", sd[p + "fc2.weight"], sd[p + "fc2.bias"])
        _ln(params, lp, "final_layer_norm",
            sd[p + "final_layer_norm.weight"],
            sd[p + "final_layer_norm.bias"])
    _ln(params, [], "emb_layer_norm_after",
        sd["emb_layer_norm_after.weight"], sd["emb_layer_norm_after.bias"])
    return {"params": params}, cfg


def from_hf_state_dict(
    sd: Mapping[str, np.ndarray], num_heads: int = 20
) -> Tuple[Dict, ESM2Config]:
    """HuggingFace EsmModel state dict -> (flax params, config)."""
    sd = {k.removeprefix("esm."): v for k, v in sd.items()}
    embed = np.asarray(sd["embeddings.word_embeddings.weight"])
    layer_ids = sorted(
        {int(m.group(1)) for k in sd
         if (m := re.match(r"encoder\.layer\.(\d+)\.", k))}
    )
    cfg = ESM2Config(num_layers=len(layer_ids), embed_dim=embed.shape[1],
                     num_heads=num_heads, vocab_size=embed.shape[0])

    params: Dict = {}
    _set(params, ["embed_tokens"], "embedding", embed)
    for i in layer_ids:
        p = f"encoder.layer.{i}."
        lp = [f"layers_{i}"]
        for proj, hf in (("q_proj", "attention.self.query"),
                         ("k_proj", "attention.self.key"),
                         ("v_proj", "attention.self.value"),
                         ("out_proj", "attention.output.dense")):
            _linear(params, lp + ["self_attn"], proj,
                    sd[p + hf + ".weight"], sd.get(p + hf + ".bias"))
        _ln(params, lp, "self_attn_layer_norm",
            sd[p + "attention.LayerNorm.weight"],
            sd[p + "attention.LayerNorm.bias"])
        _linear(params, lp, "fc1",
                sd[p + "intermediate.dense.weight"],
                sd[p + "intermediate.dense.bias"])
        _linear(params, lp, "fc2",
                sd[p + "output.dense.weight"], sd[p + "output.dense.bias"])
        _ln(params, lp, "final_layer_norm",
            sd[p + "LayerNorm.weight"], sd[p + "LayerNorm.bias"])
    _ln(params, [], "emb_layer_norm_after",
        sd["encoder.emb_layer_norm_after.weight"],
        sd["encoder.emb_layer_norm_after.bias"])
    return {"params": params}, cfg


def load_checkpoint(path: str) -> Tuple[Dict, ESM2Config]:
    """Load ESM-2 weights from a fair-esm ``.pt``, an ``.npz`` produced by
    scripts/convert_esm_checkpoint.py, or a HF model directory."""
    if path.endswith(".npz"):
        return _load_npz(path)
    if os.path.isdir(path):  # HF directory
        import torch

        bins = [
            f for f in os.listdir(path)
            if f.endswith((".bin", ".pt")) or f == "pytorch_model.bin"
        ]
        if not bins:
            raise FileNotFoundError(f"no torch weights in {path}")
        sd = torch.load(os.path.join(path, bins[0]), map_location="cpu")
        sd = {k: v.numpy() for k, v in sd.items()}
        return from_hf_state_dict(sd)
    import torch

    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    return from_fairesm_state_dict(sd)


def save_npz(path: str, params: Dict, cfg: ESM2Config) -> None:
    flat: Dict[str, np.ndarray] = {}

    def walk(node, prefix):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, prefix + k + "/")
            else:
                flat[prefix + k] = np.asarray(v)

    walk(params["params"], "")
    flat["__cfg__"] = np.asarray(
        [cfg.num_layers, cfg.embed_dim, cfg.num_heads, cfg.vocab_size],
        dtype=np.int64,
    )
    np.savez(path, **flat)


def _load_npz(path: str) -> Tuple[Dict, ESM2Config]:
    z = np.load(path)
    meta = z["__cfg__"]
    cfg = ESM2Config(num_layers=int(meta[0]), embed_dim=int(meta[1]),
                     num_heads=int(meta[2]), vocab_size=int(meta[3]))
    params: Dict = {}
    for key in z.files:
        if key == "__cfg__":
            continue
        toks = key.split("/")
        _set(params, toks[:-1], toks[-1], z[key])
    return {"params": params}, cfg
