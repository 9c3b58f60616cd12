"""AR task model: all-atom protein structure refinement.

Re-design of ``GCPNetARLitModule`` (/root/reference/src/models/
gcpnet_ar_module.py:40-195): position-updating GCPInteractions2 trunk over
all-atom graphs; predicted positions are per-residue offsets from the
residue's Ca atom: ``ca_x[res(a)] + (x_out - x_in)`` (reference :163-175,
re-expressed as a gather over global residue ids instead of a Python loop
over residues).  Loss is the RMSD-style ``sqrt(sum((p-l)^2)/N)``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gcpnet_tpu.config.schema import LayerCfg, ModelCfg, ModuleCfg
from gcpnet_tpu.graph import GraphBatch
from gcpnet_tpu.models.common import GCPNetEncoder, centralize_and_frames
from gcpnet_tpu.nn.frames import decentralize

Array = jax.Array


class GCPNetAR(nn.Module):
    model_cfg: ModelCfg
    module_cfg: ModuleCfg
    layer_cfg: LayerCfg
    remat: bool = False
    layer_class: str = "GCPInteractions2"

    @nn.compact
    def __call__(self, batch: GraphBatch, deterministic: bool = True) -> Array:
        x_input = batch.x
        centroid, centered, frames = centralize_and_frames(
            batch, norm_x_diff=self.module_cfg.norm_x_diff
        )
        batch = batch.replace(x=centered)
        encoder = GCPNetEncoder(
            remat=self.remat,
            model_cfg=self.model_cfg,
            module_cfg=self.module_cfg,
            layer_cfg=self.layer_cfg,
            layer_class=self.layer_class,
            num_atom_types=0,
            updating_node_positions=True,
            embedding_nonlinearities=self.module_cfg.nonlinearities,
            name="encoder",
        )
        _, _, x = encoder(
            batch, frames, node_pos=centered, deterministic=deterministic
        )
        x = decentralize(x, batch.graph_id, centroid, node_mask=batch.node_mask)
        x_shift = x - x_input

        # offset each atom from its residue's Ca position
        res_idx = batch.extras["atom_residue_idx"].astype(jnp.int32)
        ca_x = batch.extras["ca_x"]  # [R, 3] global residue table
        return ca_x[res_idx] + x_shift


def ar_loss(preds: Array, batch: GraphBatch) -> Tuple[Array, Array]:
    """sqrt(sum((p - l)^2) / num_real_atoms) (gcpnet_ar_module.py:194)."""
    labels = batch.extras["label"]
    mask = batch.valid_node_mask().astype(preds.dtype)[:, None]
    sq = ((preds - labels) ** 2) * mask
    n = jnp.maximum(jnp.sum(batch.valid_node_mask()), 1)
    loss = jnp.sqrt(jnp.sum(sq) / n)
    return loss, labels
