"""RS task model: binary R/S enantiomer chirality classification.

Re-design of ``GCPNetRSLitModule`` (/root/reference/src/models/
gcpnet_rs_module.py): same trunk + pooled head as LBA but with a LeakyReLU
dense head and BCE-with-logits loss.  This task is the chirality probe for
``enable_e3_equivariance``: the SE(3) model can classify R/S from geometry,
the E(3) model cannot.
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
    InvariantPooledHead,
    batch_masks,
    centralize_and_frames,
)
from gcpnet_tpu.ops.segment import masked_mean

Array = jax.Array


class GCPNetRS(nn.Module):
    model_cfg: ModelCfg
    module_cfg: ModuleCfg
    layer_cfg: LayerCfg
    remat: bool = False
    layer_class: str = "GCPInteractions"

    @nn.compact
    def __call__(self, batch: GraphBatch, deterministic: bool = True) -> Array:
        mc = self.model_cfg
        _, centered, frames = centralize_and_frames(
            batch, norm_x_diff=self.module_cfg.norm_x_diff
        )
        batch = batch.replace(x=centered)
        encoder = GCPNetEncoder(
            remat=self.remat,
            model_cfg=mc,
            module_cfg=self.module_cfg,
            layer_cfg=self.layer_cfg,
            layer_class=self.layer_class,
            num_atom_types=0,
            name="encoder",
        )
        node_rep, _ = encoder(batch, frames, deterministic=deterministic)

        edge_mask, count_mask = batch_masks(batch)
        head = InvariantPooledHead(
            node_dims=(mc.h_hidden_dim, mc.chi_hidden_dim),
            cfg=self.module_cfg,
            output_dim=mc.output_dim,
            output_scale_factor=mc.output_scale_factor,
            dense_dropout=mc.dense_dropout,
            dense_activation="leakyrelu",
            name="head",
        )
        return head(
            node_rep, batch, frames, edge_mask, count_mask,
            deterministic=deterministic,
        )


def rs_loss(logits: Array, batch: GraphBatch) -> Tuple[Array, Array]:
    """Masked BCE-with-logits over real graphs."""
    labels = batch.extras["label"].astype(jnp.float32)
    per_graph = jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    loss = masked_mean(per_graph, batch.graph_pad_mask, axis=None)
    return loss, labels
