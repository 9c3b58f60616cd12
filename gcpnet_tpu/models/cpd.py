"""CPD task model: computational protein design (per-node 20-way amino-acid
classification over CATH residue graphs).

Re-design of ``GCPNetCPDLitModule`` (/root/reference/src/models/
gcpnet_cpd_module.py:30-523): encoder trunk plus either (a) a direct-shot
``GCPMLPDecoder`` head or (b) an autoregressive decoder whose edge scalars
carry causally-masked sequence embeddings (sender < receiver) and whose
layers run in autoregressive mode (forward/backward edge split).

Autoregressive sampling (reference :276-363) is re-expressed as a
``lax.fori_loop`` over per-graph node position with static shapes: at step i
only edges whose receiver has local index i are active, per-layer node-rep
caches are updated with a masked ``where``, and residues are sampled at
temperature tau from the projected logits.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gcpnet_tpu.config.schema import LayerCfg, ModelCfg, ModuleCfg
from gcpnet_tpu.graph import GraphBatch
from gcpnet_tpu.models.common import batch_masks, centralize_and_frames
from gcpnet_tpu.nn import (
    GCPEmbedding,
    GCPInteractions,
    GCPMLPDecoder,
    ScalarVector,
)
from gcpnet_tpu.nn.gcp import make_gcp
from gcpnet_tpu.ops.segment import masked_mean

Array = jax.Array


def _decoder_cfg(cfg: ModuleCfg) -> ModuleCfg:
    """The reference rewires the decoder's gating: frame gate becomes vector
    gate and frame updates are ablated (gcpnet_cpd_module.py:95-98)."""
    return cfg.replace(
        vector_gate=cfg.frame_gate, frame_gate=False, ablate_frame_updates=True
    )


class GCPNetCPD(nn.Module):
    model_cfg: ModelCfg
    module_cfg: ModuleCfg
    layer_cfg: LayerCfg
    remat: bool = False
    layer_class: str = "GCPInteractions"
    node_input_dims: Tuple[int, int] = (6, 3)
    edge_input_dims: Tuple[int, int] = (32, 1)
    autoregressive_decoder: bool = False

    def setup(self):
        mc = self.model_cfg
        self.node_dims = (mc.h_hidden_dim, mc.chi_hidden_dim)
        self.edge_dims = (mc.e_hidden_dim, mc.xi_hidden_dim)
        vocab = mc.output_dim

        self.gcp_embedding = GCPEmbedding(
            edge_input_dims=tuple(self.edge_input_dims),
            node_input_dims=tuple(self.node_input_dims),
            edge_hidden_dims=self.edge_dims,
            node_hidden_dims=self.node_dims,
            cfg=self.module_cfg,
            num_atom_types=0,
            pre_norm=False,
        )
        self.encoder_layers = [
            GCPInteractions(
                node_dims=self.node_dims,
                edge_dims=self.edge_dims,
                cfg=self.module_cfg,
                layer_cfg=self.layer_cfg,
                dropout=self.model_cfg.dropout,
                name=f"encoder_{i}",
            )
            for i in range(mc.num_encoder_layers)
        ]

        if self.autoregressive_decoder:
            dec_cfg = _decoder_cfg(self.module_cfg)
            self.seq_embedding = nn.Embed(vocab, vocab, name="seq_embedding")
            self.decoder_layers = [
                GCPInteractions(
                    node_dims=self.node_dims,
                    edge_dims=(self.edge_dims[0] + vocab, self.edge_dims[1]),
                    cfg=dec_cfg,
                    layer_cfg=self.layer_cfg,
                    dropout=self.model_cfg.dropout,
                    autoregressive=True,
                    name=f"decoder_{i}",
                )
                for i in range(mc.num_decoder_layers)
            ]
            proj_dim = vocab
        else:
            self.decoder = GCPMLPDecoder(
                hidden_dim=self.node_dims[0],
                vocab_size=vocab,
                num_layers=mc.num_decoder_layers,
                residual_updates=mc.decoder_residual_updates,
            )
            proj_dim = self.node_dims[0]

        self.invariant_node_projection = make_gcp(
            self.node_dims,
            (proj_dim, 0),
            self.module_cfg,
            name="invariant_node_projection",
            nonlinearities=(None, None),
            bottleneck=1,
            vector_residual=False,
        )

    def _encode(self, batch: GraphBatch, frames, deterministic: bool):
        edge_mask, count_mask = batch_masks(batch)
        node_rep, edge_rep = self.gcp_embedding(batch, frames, edge_mask, count_mask)
        for layer in self.encoder_layers:
            node_rep = layer(
                node_rep,
                edge_rep,
                batch.senders,
                batch.receivers,
                frames,
                node_mask=batch.node_mask,
                edge_mask=edge_mask,
                count_mask=count_mask,
                deterministic=deterministic,
                dense_degree=batch.edge_dense_degree,
            )
        return node_rep, edge_rep

    def _causal_seq_edges(self, batch: GraphBatch, seq: Array) -> Array:
        """Sequence embeddings placed on causal edges (sender < receiver),
        zero elsewhere (gcpnet_cpd_module.py:188-193)."""
        emb = self.seq_embedding(seq.astype(jnp.int32))
        e_seq = emb[batch.senders]
        causal = (batch.senders < batch.receivers)[:, None]
        return jnp.where(causal, e_seq, 0.0)

    def __call__(
        self, batch: GraphBatch, deterministic: bool = True
    ) -> Tuple[Array, Array]:
        """Returns (logits [N, vocab], log_probs [N, vocab])."""
        _, centered, frames = centralize_and_frames(
            batch, norm_x_diff=self.module_cfg.norm_x_diff
        )
        batch = batch.replace(x=centered)
        edge_mask, count_mask = batch_masks(batch)
        node_rep, edge_rep = self._encode(batch, frames, deterministic)

        if self.autoregressive_decoder:
            encoder_rep = node_rep
            e_seq = self._causal_seq_edges(batch, batch.extras["seq"])
            edge_rep_ext = ScalarVector(
                jnp.concatenate([edge_rep.scalar, e_seq], axis=-1), edge_rep.vector
            )
            for layer in self.decoder_layers:
                node_rep = layer(
                    node_rep,
                    edge_rep_ext,
                    batch.senders,
                    batch.receivers,
                    frames,
                    node_rep_regressive=encoder_rep,
                    node_mask=batch.node_mask,
                    edge_mask=edge_mask,
                    count_mask=count_mask,
                    deterministic=deterministic,
                    dense_degree=batch.edge_dense_degree,
                )

        out = self.invariant_node_projection(
            node_rep,
            batch.senders,
            batch.receivers,
            frames,
            node_inputs=True,
            edge_mask=edge_mask,
            count_mask=count_mask,
        )
        if not self.autoregressive_decoder:
            return self.decoder(out)
        return out, jax.nn.log_softmax(out, axis=-1)

    def sample(
        self,
        batch: GraphBatch,
        rng: Array,
        nodes_per_graph: int,
        temperature: float = 0.1,
    ) -> Array:
        """Autoregressive sequence sampling (reference :276-363).

        ``batch`` should contain ``num_samples`` copies of one graph (the
        tiling the reference does with ``repeat``); each graph must have
        exactly ``nodes_per_graph`` node slots (local node index = position
        in sequence).  Returns sampled residues ``[N]``.
        """
        assert self.autoregressive_decoder
        _, centered, frames = centralize_and_frames(
            batch, norm_x_diff=self.module_cfg.norm_x_diff
        )
        batch = batch.replace(x=centered)
        edge_mask, count_mask = batch_masks(batch)
        node_rep, edge_rep = self._encode(batch, frames, deterministic=True)

        num_nodes = batch.num_nodes
        local_idx = jnp.arange(num_nodes, dtype=jnp.int32) % nodes_per_graph
        recv_local = local_idx[batch.receivers]
        valid_node = batch.valid_node_mask()

        vocab = self.model_cfg.output_dim
        n_dec = len(self.decoder_layers)
        cache_s = jnp.stack([node_rep.scalar] * n_dec)
        cache_v = jnp.stack([node_rep.vector] * n_dec)
        seq = jnp.zeros((num_nodes,), jnp.int32)

        def step(i, carry):
            seq, cache_s, cache_v, rng = carry
            e_seq = self._causal_seq_edges(batch, seq)
            edge_rep_ext = ScalarVector(
                jnp.concatenate([edge_rep.scalar, e_seq], axis=-1), edge_rep.vector
            )
            step_edge_mask = edge_mask & (recv_local == i)
            step_node_mask = (local_idx == i) & valid_node

            out_s = out_v = None
            for j, layer in enumerate(self.decoder_layers):
                rep_j = ScalarVector(cache_s[j], cache_v[j])
                out = layer(
                    rep_j,
                    edge_rep_ext,
                    batch.senders,
                    batch.receivers,
                    frames,
                    node_rep_regressive=ScalarVector(cache_s[0], cache_v[0]),
                    node_mask=step_node_mask,
                    edge_mask=step_edge_mask,
                    count_mask=count_mask,
                    deterministic=True,
                )
                out_s, out_v = out.scalar, out.vector
                if j < n_dec - 1:
                    m = step_node_mask[:, None]
                    cache_s = cache_s.at[j + 1].set(
                        jnp.where(m, out_s, cache_s[j + 1])
                    )
                    cache_v = cache_v.at[j + 1].set(
                        jnp.where(m, out_v, cache_v[j + 1])
                    )

            # reference projects with the step's node mask, which restricts
            # scalarize to edges inside {node i} — i.e. self-loops only
            proj_edge_mask = step_edge_mask & step_node_mask[batch.senders]
            logits = self.invariant_node_projection(
                ScalarVector(out_s, out_v),
                batch.senders,
                batch.receivers,
                frames,
                node_inputs=True,
                edge_mask=proj_edge_mask,
                count_mask=count_mask,
            )
            rng, sub = jax.random.split(rng)
            sampled = jax.random.categorical(sub, logits / temperature, axis=-1)
            seq = jnp.where(step_node_mask, sampled.astype(jnp.int32), seq)
            return seq, cache_s, cache_v, rng

        seq, _, _, _ = jax.lax.fori_loop(
            0, nodes_per_graph, step, (seq, cache_s, cache_v, rng)
        )
        return seq


def cpd_loss(output, batch: GraphBatch) -> Tuple[Array, Array]:
    """Masked cross-entropy over valid residues (CE == NLL of log_probs).

    ``output`` is the model's (logits, log_probs) pair.
    """
    _, log_probs = output
    seq = batch.extras["seq"].astype(jnp.int32)
    nll = -jnp.take_along_axis(log_probs, seq[:, None], axis=-1)[:, 0]
    mask = batch.valid_node_mask()
    loss = masked_mean(nll, mask, axis=None)
    return loss, seq
