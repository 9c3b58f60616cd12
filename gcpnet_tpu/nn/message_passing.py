"""Geometry-complete message passing.

Re-design of ``GCPMessagePassing`` (/root/reference/src/models/components/
gcpnet.py:838-960) for padded graphs: edge messages are built by gathering
source/destination node features, pushed through a (Res)GCP stack, optionally
gated by a learned sigmoid scalar attention, and reduced to nodes with masked
segment mean/sum.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gcpnet_tpu.config.schema import LayerCfg, ModuleCfg
from gcpnet_tpu.nn.gcp import Dense, make_gcp
from gcpnet_tpu.nn.primitives import ScalarVector
from gcpnet_tpu.ops.segment import segment_mean, segment_sum

Array = jax.Array


class GCPMessagePassing(nn.Module):
    input_dims: Tuple[int, int]
    output_dims: Tuple[int, int]
    edge_dims: Tuple[int, int]
    cfg: ModuleCfg
    layer_cfg: LayerCfg
    reduce_function: str = "mean"  # "mean" | "sum" | "add"
    use_scalar_message_attention: bool = False
    aggregate_with_row: bool = False

    @nn.compact
    def __call__(
        self,
        node_rep: ScalarVector,
        edge_rep: ScalarVector,
        senders: Array,
        receivers: Array,
        frames: Array,
        edge_mask: Optional[Array] = None,
        count_mask: Optional[Array] = None,
        row_splits: Optional[Array] = None,
        frame_mask: Optional[Array] = None,
    ) -> ScalarVector:
        """``edge_mask`` gates the final message aggregation (padding-level);
        ``frame_mask`` (defaults to ``edge_mask``) gates the scalarize/
        vectorize numerators inside the message GCP stack — the reference
        masks those by node validity but still aggregates every edge's
        message (gcpnet.py:899-947 with components/__init__.py:294-309)."""
        mp_cfg = self.layer_cfg.mp_cfg
        num_nodes = node_rep.scalar.shape[0]
        s_in, v_in = self.input_dims
        e_s, e_v = self.edge_dims

        # message = [src node SV ‖ edge SV ‖ dst node SV] (gcpnet.py:907-917)
        # gather the flattened node features ONCE per endpoint: one [N, s+3v]
        # gather (and one backward scatter-add) instead of two each — the
        # profile shows these gathers/scatter-adds among the top ops
        flat_nodes = node_rep.flatten()
        v_dim = node_rep.dims[1]
        src = ScalarVector.recover(flat_nodes[senders], v_dim)
        dst = ScalarVector.recover(flat_nodes[receivers], v_dim)
        message = src.concat((edge_rep, dst))

        scalars_in = 2 * s_in + e_s
        vectors_in = 2 * v_in + e_v

        # soft cfg (first/last GCP): default bottleneck + default vector
        # residual (gcpnet.py:867-871)
        soft = dict(
            bottleneck=self.cfg.default_bottleneck,
            vector_residual=self.cfg.default_vector_residual,
        )
        n_layers = mp_cfg.num_message_layers
        stack = [
            make_gcp(
                (scalars_in, vectors_in),
                self.output_dims,
                self.cfg,
                name="message_fusion_0",
                nonlinearities=self.cfg.nonlinearities if n_layers > 1 else None,
                **soft,
            )
        ]
        for i in range(max(0, n_layers - 2)):
            stack.append(
                make_gcp(
                    self.output_dims,
                    self.output_dims,
                    self.cfg,
                    name=f"message_fusion_{i + 1}",
                )
            )
        if n_layers > 1:
            stack.append(
                make_gcp(
                    self.output_dims,
                    self.output_dims,
                    self.cfg,
                    name=f"message_fusion_{n_layers - 1}",
                    nonlinearities=(None, None),
                    **soft,
                )
            )

        fm = frame_mask if frame_mask is not None else edge_mask

        def run(module, rep):
            return module(
                rep,
                senders,
                receivers,
                frames,
                node_inputs=False,
                edge_mask=fm,
                count_mask=count_mask,
            )

        if mp_cfg.use_residual_message_gcp:
            # ResGCP: residual connections between message layers
            residual = run(stack[0], message)
            for module in stack[1:]:
                residual = residual + run(module, residual)
        else:
            residual = message
            for module in stack:
                residual = run(module, residual)

        if self.use_scalar_message_attention:
            attn = jax.nn.sigmoid(
                Dense(1, name="scalar_message_attention")(residual.scalar)
            )
            residual = ScalarVector(residual.scalar * attn, residual.vector)

        flat = residual.flatten()
        ids = senders if self.aggregate_with_row else receivers
        # receiver-sorted layouts ride the Pallas MXU segment kernel
        rs = None if self.aggregate_with_row else row_splits
        if self.reduce_function == "mean":
            agg = segment_mean(
                flat, ids, num_nodes, mask=edge_mask, count_mask=count_mask,
                row_splits=rs,
            )
        elif self.reduce_function in ("sum", "add"):
            agg = segment_sum(flat, ids, num_nodes, mask=edge_mask, row_splits=rs)
        else:
            raise ValueError(f"unknown reduce_function {self.reduce_function!r}")
        return ScalarVector.recover(agg, self.output_dims[1])
