"""Input embedding for nodes and edges.

Re-design of ``GCPEmbedding`` (/root/reference/src/models/components/
gcpnet.py:703-823): optional atom-type embedding table, optional ligand-flag
embedding concat (LBA), pre/post GCPLayerNorm, then one edge-GCP and one
node-GCP.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gcpnet_tpu.config.schema import ModuleCfg
from gcpnet_tpu.graph import GraphBatch
from gcpnet_tpu.nn.frames import node_mean_frames
from gcpnet_tpu.nn.gcp import make_gcp
from gcpnet_tpu.nn.primitives import GCPLayerNorm, ScalarVector, pack_vector

Array = jax.Array


class GCPEmbedding(nn.Module):
    edge_input_dims: Tuple[int, int]
    node_input_dims: Tuple[int, int]
    edge_hidden_dims: Tuple[int, int]
    node_hidden_dims: Tuple[int, int]
    cfg: ModuleCfg
    num_atom_types: int = 0
    num_lig_flags: int = 2
    nonlinearities: Optional[Tuple[Optional[str], Optional[str]]] = None
    pre_norm: bool = True

    @nn.compact
    def __call__(
        self,
        batch: GraphBatch,
        frames: Array,
        edge_mask: Optional[Array] = None,
        count_mask: Optional[Array] = None,
    ) -> Tuple[ScalarVector, ScalarVector]:
        node_input_dims = tuple(self.node_input_dims)

        if self.num_atom_types > 0:
            atom_embed = nn.Embed(
                self.num_atom_types, self.num_atom_types, name="atom_embedding"
            )
            h = atom_embed(batch.h.astype(jnp.int32))
        else:
            h = batch.h
        chi_p = pack_vector(batch.chi)
        node_rep = ScalarVector(h, chi_p)

        if self.cfg.concatenate_lig_flag:
            lig_embed = nn.Embed(
                self.num_lig_flags, self.num_lig_flags, name="lig_flag_embedding"
            )
            lig = lig_embed(batch.extras["lig_flag"].astype(jnp.int32))
            node_rep = ScalarVector(
                jnp.concatenate([node_rep.scalar, lig], axis=-1), chi_p
            )
            node_input_dims = (
                node_input_dims[0] + self.num_lig_flags,
                node_input_dims[1],
            )

        edge_rep = ScalarVector(batch.e, pack_vector(batch.xi))

        edge_sv = self.edge_input_dims[1] > 0
        node_sv = node_input_dims[1] > 0

        if self.pre_norm:
            edge_rep = GCPLayerNorm(name="edge_normalization")(
                edge_rep if edge_sv else edge_rep.scalar
            )
            node_rep = GCPLayerNorm(name="node_normalization")(
                node_rep if node_sv else node_rep.scalar
            )
        else:
            if not edge_sv:
                edge_rep = edge_rep.scalar
            if not node_sv:
                node_rep = node_rep.scalar

        # the reference instantiates embedding GCPs directly from the class
        # with constructor defaults for bottleneck (1) and vector_residual
        # (False) — only the flag subset is forwarded (gcpnet.py:735-763)
        nls = self.nonlinearities
        embed_overrides = dict(bottleneck=1, vector_residual=False)
        edge_gcp = make_gcp(
            self.edge_input_dims,
            self.edge_hidden_dims,
            self.cfg,
            name="edge_embedding",
            nonlinearities=nls if nls is not None else (None, None),
            **embed_overrides,
        )
        node_gcp = make_gcp(
            (node_input_dims[0], node_input_dims[1]),
            self.node_hidden_dims,
            self.cfg,
            name="node_embedding",
            nonlinearities=(None, None),
            **embed_overrides,
        )

        edge_out = edge_gcp(
            edge_rep,
            batch.senders,
            batch.receivers,
            frames,
            node_inputs=False,
            edge_mask=edge_mask,
            count_mask=count_mask,
        )
        nf = node_mean_frames(
            frames, batch.senders, batch.h.shape[0], edge_mask, count_mask,
            sender_perm=batch.sender_perm,
            sender_degree=batch.sender_out_degree,
        )
        node_out = node_gcp(
            node_rep,
            batch.senders,
            batch.receivers,
            frames,
            node_inputs=True,
            edge_mask=edge_mask,
            count_mask=count_mask,
            node_frames=nf,
        )

        if not self.pre_norm:
            edge_out = GCPLayerNorm(name="edge_normalization")(edge_out)
            node_out = GCPLayerNorm(name="node_normalization")(node_out)

        if not isinstance(edge_out, ScalarVector):
            edge_out = ScalarVector(
                edge_out, jnp.zeros(edge_out.shape[:-1] + (0,), edge_out.dtype)
            )
        if not isinstance(node_out, ScalarVector):
            node_out = ScalarVector(
                node_out, jnp.zeros(node_out.shape[:-1] + (0,), node_out.dtype)
            )
        return node_out, edge_out
