"""NMS task model: Newtonian many-body future-position regression.

Re-design of ``GCPNetNMSLitModule`` (/root/reference/src/models/
gcpnet_nms_module.py:26-151): centralize -> localize -> embed -> N
position-updating GCPInteractions -> decentralize; MSE on coordinates.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gcpnet_tpu.config.schema import LayerCfg, ModelCfg, ModuleCfg
from gcpnet_tpu.graph import GraphBatch
from gcpnet_tpu.models.common import GCPNetEncoder, centralize_and_frames
from gcpnet_tpu.nn.frames import decentralize
from gcpnet_tpu.ops.segment import masked_mean

Array = jax.Array


class GCPNetNMS(nn.Module):
    model_cfg: ModelCfg
    module_cfg: ModuleCfg
    layer_cfg: LayerCfg
    remat: bool = False
    layer_class: str = "GCPInteractions"

    @nn.compact
    def __call__(self, batch: GraphBatch, deterministic: bool = True) -> Array:
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
            name="encoder",
        )
        _, _, x = encoder(
            batch, frames, node_pos=centered, deterministic=deterministic
        )
        x = decentralize(x, batch.graph_id, centroid, node_mask=batch.node_mask)
        return x


def nms_loss(preds: Array, batch: GraphBatch) -> Tuple[Array, Array]:
    """Masked position MSE (reference uses ``nn.MSELoss`` over [N, 3])."""
    labels = batch.extras["label"]
    sq = (preds - labels) ** 2
    loss = masked_mean(
        sq.reshape(sq.shape[0], -1), batch.node_pad_mask, axis=None
    )
    return loss, labels
