"""Translate reference PyTorch state dicts into this framework's flax
parameter trees.

The reference (/root/reference/src/models/components/gcpnet.py) stores
weights under torch module paths like ``interaction.message_fusion.3.
vector_down.weight``; the flax modules here use the same component names
with ModuleList indices folded into the name (``message_fusion_3``) and
``nn.Linear``'s ``[out, in]`` weight transposed to a ``[in, out]`` kernel.
Used by the golden parity tests (tests/test_parity_golden.py) and by
checkpoint importers.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

# torch attribute name -> flax module name (applied after index folding)
_RENAMES = {
    "feedforward_network": "feedforward",
    "node_position_update_network": "node_position_update",
}

# Sequential wrappers whose single parametrized child keeps the parent name
_SEQUENTIAL_COLLAPSE = {"scalar_message_attention"}

# nn.Embedding tables: weight maps to flax nn.Embed's "embedding", untransposed
_EMBED_MODULES = {"atom_embedding", "lig_flag_embedding", "sequence_embedding"}


def _fold_indices(tokens):
    """Fold ModuleList/Sequential numeric path elements into their parent
    name: ["message_fusion", "3"] -> ["message_fusion_3"]."""
    out = []
    for tok in tokens:
        if tok.isdigit() and out:
            out[-1] = f"{out[-1]}_{tok}"
        else:
            out.append(_RENAMES.get(tok, tok))
    return out


def _translate_module_path(tokens):
    folded = _fold_indices(tokens)
    result = []
    for tok in folded:
        base, _, idx = tok.rpartition("_")
        if base in _SEQUENTIAL_COLLAPSE and idx.isdigit():
            result.append(base)
        elif base == "scalar_out" and idx.isdigit():
            # GCP3 feedforward_out Sequential(Linear, act, Linear):
            # torch indices 0 and 2 -> flax scalar_out_0 / scalar_out_1
            result.append(f"scalar_out_{int(idx) // 2}")
        else:
            result.append(tok)
    return result


def translate_state_dict(
    state_dict: Mapping[str, np.ndarray]
) -> Dict:
    """Convert a torch ``state_dict`` (name -> ndarray) into a nested flax
    params dict (the contents of ``{"params": ...}``)."""
    params: Dict = {}
    for name, value in state_dict.items():
        value = np.asarray(value)
        tokens = name.split(".")
        leaf = tokens[-1]
        path = _translate_module_path(tokens[:-1])

        if len(path) >= 2 and path[-2:] == ["phi_force_ij", "1"]:
            # nn.Sequential(act, Linear(bias=False)) -> flat module param
            path = path[:-2]
            leaf_name, leaf_value = "phi_force_ij_kernel", value.T
        elif path and path[-1] == "phi_force_ij_1":
            path = path[:-1]
            leaf_name, leaf_value = "phi_force_ij_kernel", value.T
        elif path and path[-1] in _EMBED_MODULES and leaf == "weight":
            leaf_name, leaf_value = "embedding", value
        elif leaf == "weight" and value.ndim == 2:
            leaf_name, leaf_value = "kernel", value.T
        elif leaf == "weight" and value.ndim == 1:
            # LayerNorm affine weight
            leaf_name, leaf_value = "scale", value
        elif leaf == "bias":
            leaf_name, leaf_value = "bias", value
        else:
            raise ValueError(f"cannot translate state-dict entry {name!r}")

        node = params
        for tok in path:
            node = node.setdefault(tok, {})
        node[leaf_name] = leaf_value
    return params
