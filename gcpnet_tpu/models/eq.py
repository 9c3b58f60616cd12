"""EQ task model: per-residue lDDT structure-quality regression over
all-atom protein graphs.

Re-design of ``GCPNetEQLitModule`` (/root/reference/src/models/
gcpnet_eq_module.py:37-230): atom-type embedding concatenated onto node
scalars (ESM residue embeddings + plDDT arrive via the data pipeline),
GCPInteractions2 trunk, invariant projection, masked mean-pool of atom
scalars onto residues (``atom_residue_idx``), dense head.

The reference's batch-local -> global residue index conversion
(src/models/__init__.py:182-198) happens on the host at batch-build time;
``extras["atom_residue_idx"]`` is already global here.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gcpnet_tpu.config.schema import LayerCfg, ModelCfg, ModuleCfg
from gcpnet_tpu.graph import GraphBatch
from gcpnet_tpu.models.common import (
    GCPNetEncoder,
    batch_masks,
    centralize_and_frames,
)
from gcpnet_tpu.nn import GCPLayerNorm
from gcpnet_tpu.nn.gcp import Dense, make_gcp
from gcpnet_tpu.ops.segment import masked_mean, segment_mean

Array = jax.Array

NUM_EQ_ATOM_TYPES = 38  # reference eq_dataset.py ATOM_TYPES table (37) + UNK


class GCPNetEQ(nn.Module):
    model_cfg: ModelCfg
    module_cfg: ModuleCfg
    layer_cfg: LayerCfg
    remat: bool = False
    layer_class: str = "GCPInteractions2"
    num_atom_types: int = NUM_EQ_ATOM_TYPES
    num_residues: int = 0  # static padded residue count; 0 = infer from extras

    @nn.compact
    def __call__(self, batch: GraphBatch, deterministic: bool = True) -> Array:
        mc = self.model_cfg
        _, centered, frames = centralize_and_frames(
            batch, norm_x_diff=self.module_cfg.norm_x_diff
        )
        batch = batch.replace(x=centered)

        atom_embed = nn.Embed(
            self.num_atom_types, self.num_atom_types, name="atom_embedding"
        )
        h = jnp.concatenate(
            [batch.h, atom_embed(batch.extras["atom_types"].astype(jnp.int32))],
            axis=-1,
        )
        batch = batch.replace(h=h)

        encoder = GCPNetEncoder(
            remat=self.remat,
            model_cfg=mc,
            module_cfg=self.module_cfg,
            layer_cfg=self.layer_cfg,
            layer_class=self.layer_class,
            num_atom_types=0,
            node_input_dims=(mc.h_input_dim + self.num_atom_types, mc.chi_input_dim),
            embedding_nonlinearities=self.module_cfg.nonlinearities,
            name="encoder",
        )
        node_rep, _ = encoder(batch, frames, deterministic=deterministic)

        edge_mask, count_mask = batch_masks(batch)
        out = GCPLayerNorm(name="projection_norm")(node_rep)
        proj = make_gcp(
            (mc.h_hidden_dim, mc.chi_hidden_dim),
            (mc.h_hidden_dim, 0),
            self.module_cfg,
            name="invariant_node_projection",
            nonlinearities=self.module_cfg.nonlinearities,
            bottleneck=1,
            vector_residual=False,
        )
        out = proj(
            out, batch.senders, batch.receivers, frames,
            node_inputs=True, edge_mask=edge_mask, count_mask=count_mask,
        )

        # masked atom -> residue mean pool (gcpnet_eq_module.py:227)
        res_idx = batch.extras["atom_residue_idx"].astype(jnp.int32)
        num_res = self.num_residues or batch.extras["res_mask"].shape[0]
        res_out = segment_mean(
            out, res_idx, num_res, mask=batch.valid_node_mask()
        )

        hidden = mc.h_hidden_dim * mc.output_scale_factor
        y = Dense(hidden, name="dense_0")(res_out)
        y = jax.nn.relu(y)
        y = nn.Dropout(mc.dense_dropout, deterministic=deterministic)(y)
        y = Dense(mc.output_dim, name="dense_1")(y)
        return y[..., 0]


def eq_loss(preds: Array, batch: GraphBatch) -> Tuple[Array, Array]:
    """Masked SmoothL1 (beta=1) over real residues."""
    labels = batch.extras["label"]
    diff = preds - labels
    absd = jnp.abs(diff)
    smooth = jnp.where(absd < 1.0, 0.5 * diff * diff, absd - 0.5)
    loss = masked_mean(smooth, batch.extras["res_mask"].astype(bool), axis=None)
    return loss, labels
