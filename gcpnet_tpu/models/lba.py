"""LBA task model: ligand binding affinity graph regression.

Re-design of ``GCPNetLBALitModule`` (/root/reference/src/models/
gcpnet_lba_module.py:28-194): atom-type embedding -> trunk -> invariant
projection -> graph mean-pool -> 2-layer dense head; MSE loss.
Also serves PSR (identical head; per-decoy GDT-TS regression,
gcpnet_psr_module.py:161-192).
"""

from __future__ import annotations

from typing import Tuple

import jax
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


class GCPNetLBA(nn.Module):
    model_cfg: ModelCfg
    module_cfg: ModuleCfg
    layer_cfg: LayerCfg
    remat: bool = False
    layer_class: str = "GCPInteractions"
    num_atom_types: int = 9

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
            num_atom_types=self.num_atom_types,
            node_input_dims=(self.num_atom_types, mc.chi_input_dim),
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
            name="head",
        )
        return head(
            node_rep, batch, frames, edge_mask, count_mask,
            deterministic=deterministic,
        )


def graph_regression_loss(preds: Array, batch: GraphBatch) -> Tuple[Array, Array]:
    """Masked per-graph MSE (LBA and PSR)."""
    labels = batch.extras["label"]
    sq = (preds - labels) ** 2
    loss = masked_mean(sq, batch.graph_pad_mask, axis=None)
    return loss, labels


GCPNetPSR = GCPNetLBA  # PSR uses the identical architecture with num_atom_types=9
