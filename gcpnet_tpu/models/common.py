"""Shared model-building blocks for the seven task models.

Every task model follows the reference skeleton (SURVEY.md §2.3):
``centralize -> localize -> GCPEmbedding -> N interaction layers -> head``.
The padded-graph masks are derived once per forward and threaded through.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from gcpnet_tpu.config.schema import LayerCfg, ModelCfg, ModuleCfg
from gcpnet_tpu.graph import GraphBatch
from gcpnet_tpu.nn import (
    GCPEmbedding,
    GCPInteractions,
    GCPInteractions2,
    GCPLayerNorm,
    ScalarVector,
    centralize,
    localize,
)
from gcpnet_tpu.nn.frames import node_mean_frames
from gcpnet_tpu.nn.gcp import Dense, make_gcp
from gcpnet_tpu.nn.primitives import get_nonlinearity
from gcpnet_tpu.ops.segment import segment_mean

Array = jax.Array

LAYER_CLASSES = {
    "GCPInteractions": GCPInteractions,
    "GCPInteractions2": GCPInteractions2,
}

# roll the N structurally-identical interaction layers into ONE ``lax.scan``
# body over their stacked parameters: XLA compiles a single layer body
# instead of N copies (~N x smaller HLO graph — the dominant compile cost of
# this model on the remote TPU compiler), with identical math.  Parameters
# stay under their per-layer ``interaction_{i}`` names (checkpoints are
# interchangeable with the unrolled path): each bound layer module is
# touched once on a 1-node dummy so flax registers its params, then the
# per-layer trees are stacked at trace time and an unbound template module
# is scanned over them.
#
# None = auto: scan on CPU (compile time dominates — tests, the virtual-mesh
# dryrun), unrolled on TPU (measured on v5e at LBA bench scale, round 3: the
# scanned encoder RUNS ~40 ms/step slower — 247 vs 207 ms — while compiling
# ~3x faster; production training wants runtime, and the persistent compile
# cache amortizes the one-time unrolled compile).  Env override:
# GCPNET_SCAN_ENCODER=0/1.
SCAN_ENCODER: Optional[bool] = None


def scan_encoder_enabled() -> bool:
    if SCAN_ENCODER is not None:
        return SCAN_ENCODER
    import os

    env = os.environ.get("GCPNET_SCAN_ENCODER", "")
    if env:
        return env not in ("0", "false", "False")
    return jax.default_backend() == "cpu"


def batch_masks(batch: GraphBatch):
    """(edge_mask numerator, count_mask denominator) per reference semantics:
    the denominator of masked scalarize/vectorize means counts all real
    edges (see gcpnet_tpu.nn.frames)."""
    return batch.valid_edge_mask(), batch.edge_pad_mask


def centralize_and_frames(
    batch: GraphBatch, norm_x_diff: bool = True
) -> Tuple[Array, Array, Array]:
    """Returns (centroid [G,3], centered x [N,3], frames f_ij [E,3,3])."""
    node_mask = batch.valid_node_mask()
    centroid, centered = centralize(
        batch.x, batch.graph_id, batch.num_graphs, node_mask=node_mask
    )
    edge_mask, _ = batch_masks(batch)
    frames = localize(
        centered,
        batch.senders,
        batch.receivers,
        norm_x_diff=norm_x_diff,
        edge_mask=edge_mask,
    )
    return centroid, centered, frames


class InvariantPooledHead(nn.Module):
    """GCPLayerNorm -> invariant-projection GCP -> graph mean-pool -> dense
    MLP head (reference gcpnet_lba_module.py:88-110,176-184)."""

    node_dims: Tuple[int, int]
    cfg: ModuleCfg
    output_dim: int = 1
    output_scale_factor: int = 2
    dense_dropout: float = 0.1
    dense_activation: str = "relu"  # RS uses leakyrelu (gcpnet_rs_module.py)

    @nn.compact
    def __call__(
        self,
        node_rep: ScalarVector,
        batch: GraphBatch,
        frames: Array,
        edge_mask: Optional[Array],
        count_mask: Optional[Array],
        deterministic: bool = True,
    ) -> Array:
        out = GCPLayerNorm(name="projection_norm")(node_rep)
        proj = make_gcp(
            tuple(self.node_dims),
            (self.node_dims[0], 0),
            self.cfg,
            name="invariant_node_projection",
            nonlinearities=self.cfg.nonlinearities,
            bottleneck=1,
            vector_residual=False,
        )
        # one frames-mean replaces the per-edge gather + scatter-mean inside
        # the projection's scalarize (linearity fast path — the encoder does
        # the same; profiling showed this head scatter-add among the top
        # schedule-slack ops at ~5 ms/step on the LBA bench)
        nf = node_mean_frames(
            frames,
            batch.senders,
            node_rep.scalar.shape[0],
            edge_mask,
            count_mask,
            sender_perm=batch.sender_perm,
            sender_degree=batch.sender_out_degree,
            sender_inv=batch.sender_inv_perm,
        )
        out = proj(
            out,
            batch.senders,
            batch.receivers,
            frames,
            node_inputs=True,
            edge_mask=edge_mask,
            count_mask=count_mask,
            node_frames=nf,
        )
        pooled = segment_mean(
            out, batch.graph_id, batch.num_graphs, mask=batch.valid_node_mask()
        )
        hidden = self.node_dims[0] * self.output_scale_factor
        y = Dense(hidden, name="dense_0")(pooled)
        y = get_nonlinearity(self.dense_activation)(y)
        y = nn.Dropout(self.dense_dropout, deterministic=deterministic)(y)
        y = Dense(self.output_dim, name="dense_1")(y)
        if self.output_dim == 1:
            y = y[..., 0]
        return y


class GCPNetEncoder(nn.Module):
    """Embedding + a stack of interaction layers (the shared trunk)."""

    model_cfg: ModelCfg
    module_cfg: ModuleCfg
    layer_cfg: LayerCfg
    layer_class: str = "GCPInteractions"
    num_atom_types: int = 0
    node_input_dims: Optional[Tuple[int, int]] = None
    edge_input_dims: Optional[Tuple[int, int]] = None
    updating_node_positions: bool = False
    embedding_pre_norm: bool = True
    embedding_nonlinearities: Optional[Tuple[Optional[str], Optional[str]]] = None
    # rematerialize each interaction layer in the backward pass: trades
    # recompute FLOPs for HBM activation traffic.  False = store all
    # activations; True = full per-layer remat (measured +34% flops,
    # 291 ms/step at batch 16 — a loss); "dots" = policy remat saving
    # only dot_general outputs (jax.checkpoint_policies.dots_saveable):
    # the elementwise/dropout/norm chains that dominate the step's HBM
    # traffic are recomputed from the saved matmul outputs in backward,
    # with NO matmul recompute.
    remat: Union[bool, str] = False

    def _remat_policy(self):
        if self.remat == "dots":
            return jax.checkpoint_policies.dots_saveable
        if isinstance(self.remat, str):
            raise ValueError(
                f"unknown remat policy {self.remat!r}; use False, True, "
                "or 'dots'"
            )
        return None

    @nn.compact
    def __call__(
        self,
        batch: GraphBatch,
        frames: Array,
        node_pos: Optional[Array] = None,
        deterministic: bool = True,
    ):
        mc = self.model_cfg
        node_dims = (mc.h_hidden_dim, mc.chi_hidden_dim)
        edge_dims = (mc.e_hidden_dim, mc.xi_hidden_dim)
        node_in = self.node_input_dims or (mc.h_input_dim, mc.chi_input_dim)
        edge_in = self.edge_input_dims or (mc.e_input_dim, mc.xi_input_dim)

        edge_mask, count_mask = batch_masks(batch)
        node_mask = batch.node_mask

        embed = GCPEmbedding(
            edge_input_dims=edge_in,
            node_input_dims=node_in,
            edge_hidden_dims=edge_dims,
            node_hidden_dims=node_dims,
            cfg=self.module_cfg,
            num_atom_types=self.num_atom_types,
            pre_norm=self.embedding_pre_norm,
            nonlinearities=self.embedding_nonlinearities,
            name="gcp_embedding",
        )
        node_rep, edge_rep = embed(batch, frames, edge_mask, count_mask)

        layer_cls = LAYER_CLASSES[self.layer_class]

        # ``deterministic`` (a Python bool) must stay STATIC under remat:
        # binding it by closure keeps GCPDropout's `if deterministic` branch
        # concrete while every array argument is passed (and saved) explicitly.
        dense_degree = batch.edge_dense_degree  # static (non-pytree) marker

        sender_degree = batch.sender_out_degree  # static (non-pytree)

        def run_layer(
            mdl, nrep, erep, senders, receivers, frms,
            nmask, npos, emask, cmask, rsplits, sperm, sinv,
        ):
            return mdl(
                nrep, erep, senders, receivers, frms,
                node_mask=nmask, node_pos=npos, edge_mask=emask,
                count_mask=cmask, row_splits=rsplits,
                deterministic=deterministic,
                dense_degree=dense_degree,
                sender_perm=sperm, sender_degree=sender_degree,
                sender_inv=sinv,
            )

        # prevent_cse=True is REQUIRED on the unrolled path: with CSE
        # allowed, XLA merges the rematerialized forward back into the
        # stored one and remat becomes a measured no-op (identical step
        # time and +0.15% flops on the r4 bench).  The scanned path keeps
        # prevent_cse=False (safe under lax.scan, cheaper).
        run = (
            nn.remat(
                run_layer, prevent_cse=True, policy=self._remat_policy()
            )
            if self.remat
            else run_layer
        )

        layer_kwargs = dict(
            node_dims=node_dims,
            edge_dims=edge_dims,
            cfg=self.module_cfg,
            layer_cfg=self.layer_cfg,
            dropout=mc.dropout,
            updating_node_positions=self.updating_node_positions,
        )
        layers = [
            layer_cls(name=f"interaction_{i}", **layer_kwargs)
            for i in range(mc.num_encoder_layers)
        ]

        use_scan = (
            scan_encoder_enabled()
            and mc.num_encoder_layers >= 2
            and not self.is_initializing()
        )
        if use_scan:
            node_rep, node_pos = self._scan_layers(
                layers, layer_cls, layer_kwargs, run, node_rep, edge_rep,
                batch, frames, node_mask, node_pos, edge_mask, count_mask,
                deterministic,
            )
        else:
            for layer in layers:
                out = run(
                    layer,
                    node_rep,
                    edge_rep,
                    batch.senders,
                    batch.receivers,
                    frames,
                    node_mask,
                    node_pos,
                    edge_mask,
                    count_mask,
                    batch.edge_row_splits,
                    batch.sender_perm,
                    batch.sender_inv_perm,
                )
                if self.updating_node_positions:
                    node_rep, node_pos = out
                else:
                    node_rep = out

        if self.updating_node_positions:
            return node_rep, edge_rep, node_pos
        return node_rep, edge_rep

    def _scan_layers(
        self, layers, layer_cls, layer_kwargs, run, node_rep, edge_rep,
        batch, frames, node_mask, node_pos, edge_mask, count_mask,
        deterministic,
    ):
        """One ``lax.scan`` over the stacked per-layer params (see
        SCAN_ENCODER).  Dummy 1-node/1-edge calls register every layer's
        params under its own name; XLA dead-code-eliminates the dummy
        compute."""
        s_dim, v_dim = layers[0].node_dims
        es_dim, ev_dim = layers[0].edge_dims
        dt = node_rep.scalar.dtype
        dummy_node = ScalarVector(
            jnp.zeros((1, s_dim), dt), jnp.zeros((1, 3 * v_dim), dt)
        )
        dummy_edge = ScalarVector(
            jnp.zeros((1, es_dim), dt), jnp.zeros((1, 3 * ev_dim), dt)
        )
        zi = jnp.zeros((1,), jnp.int32)
        dummy_frames = jnp.zeros((1, 9), dt)
        dummy_pos = jnp.zeros((1, 3), dt) if node_pos is not None else None

        def like(mask):
            return None if mask is None else jnp.ones((1,), mask.dtype)

        for layer in layers:
            # direct dummy call (1 node / 1 edge) purely to register params;
            # dense_degree must stay off here — the dense layout's static
            # shape contract (E == N*K) does not hold for the dummy
            layer(
                dummy_node, dummy_edge, zi, zi, dummy_frames,
                node_mask=like(node_mask), node_pos=dummy_pos,
                edge_mask=like(edge_mask), count_mask=like(count_mask),
                row_splits=None, deterministic=deterministic,
            )
        stacked = jax.tree.map(
            lambda *xs: jnp.stack(xs, 0),
            *[layer.variables["params"] for layer in layers],
        )
        template = layer_cls(parent=None, **layer_kwargs)

        needs_rng = not deterministic and self.model_cfg.dropout > 0.0
        if needs_rng:
            keys = jax.random.split(
                self.make_rng("dropout"), len(layers)
            )
        else:
            keys = jnp.zeros((len(layers),), jnp.uint32)

        updating = self.updating_node_positions
        senders, receivers = batch.senders, batch.receivers
        row_splits = batch.edge_row_splits

        def body(carry, xs):
            params, key = xs
            nrep, npos = carry
            out = template.apply(
                {"params": params},
                nrep, edge_rep, senders, receivers, frames,
                node_mask=node_mask, node_pos=npos, edge_mask=edge_mask,
                count_mask=count_mask, row_splits=row_splits,
                deterministic=deterministic,
                dense_degree=batch.edge_dense_degree,
                sender_perm=batch.sender_perm,
                sender_degree=batch.sender_out_degree,
                sender_inv=batch.sender_inv_perm,
                rngs={"dropout": key} if needs_rng else None,
            )
            if updating:
                return (out[0], out[1]), None
            return (out, npos), None

        if self.remat:
            # deterministic stays static (closed over, never an argument)
            body = jax.checkpoint(
                body, prevent_cse=False, policy=self._remat_policy()
            )

        (node_rep, node_pos), _ = jax.lax.scan(
            body, (node_rep, node_pos), (stacked, keys)
        )
        return node_rep, node_pos
