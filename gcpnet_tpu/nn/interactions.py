"""GCP interaction layers (message passing + feed-forward + norms +
optional equivariant position updates).

Re-design of ``GCPInteractions`` / ``GCPInteractions2``
(/root/reference/src/models/components/gcpnet.py:963-1451).  Dynamic-shape
constructs in the reference (boolean ``idx`` subsetting, PyG ``subgraph``
re-extraction, gcpnet.py:1201-1217) are replaced by pure masking with
identical numerics on valid rows: masked rows ride along with zeroed
contributions and are merged back with a ``where`` at the end.

The autoregressive split (row < col forward / backward edge sets,
gcpnet.py:1065-1116) becomes two masked passes over the same static edge
arrays.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gcpnet_tpu.config.schema import LayerCfg, ModuleCfg
from gcpnet_tpu.nn.gcp import Dense, make_gcp
from gcpnet_tpu.nn.message_passing import GCPMessagePassing
from gcpnet_tpu.nn.frames import frame_rows, node_mean_frames
from gcpnet_tpu.nn.primitives import (
    GCPDropout,
    GCPLayerNorm,
    ScalarVector,
    get_nonlinearity,
    vec_at,
)
from gcpnet_tpu.ops.segment import (
    gather_by_senders,
    segment_count,
    segment_mean,
    segment_sum,
)

Array = jax.Array


def _ff_hidden_dims(node_dims: Tuple[int, int], num_ff: int) -> Tuple[int, int]:
    if num_ff == 1:
        return tuple(node_dims)
    return (4 * node_dims[0], 2 * node_dims[1])


class GCPInteractions(nn.Module):
    """Full interaction layer for LBA/PSR/CPD/NMS/RS (gcpnet.py:963-1262)."""

    node_dims: Tuple[int, int]
    edge_dims: Tuple[int, int]
    cfg: ModuleCfg
    layer_cfg: LayerCfg
    dropout: float = 0.1
    autoregressive: bool = False
    nonlinearities: Optional[Tuple[Optional[str], Optional[str]]] = None
    updating_node_positions: bool = False

    @nn.compact
    def __call__(
        self,
        node_rep: ScalarVector,
        edge_rep: ScalarVector,
        senders: Array,
        receivers: Array,
        frames: Array,
        node_rep_regressive: Optional[ScalarVector] = None,
        node_mask: Optional[Array] = None,
        node_pos: Optional[Array] = None,
        edge_mask: Optional[Array] = None,
        count_mask: Optional[Array] = None,
        row_splits: Optional[Array] = None,
        deterministic: bool = True,
        dense_degree: Optional[int] = None,
        sender_perm: Optional[Array] = None,
        sender_degree: Optional[int] = None,
        sender_inv: Optional[Array] = None,
    ):
        node_rep = ScalarVector(*node_rep)
        edge_rep = ScalarVector(*edge_rep)
        num_nodes = node_rep.scalar.shape[0]
        reduce_function = "add" if self.autoregressive else "mean"

        # Reference mask semantics (gcpnet.py:1161-1246): node validity gates
        # the scalarize/vectorize numerators inside the message GCPs, but the
        # message aggregation itself runs over every (real) edge; only the
        # padding mask may gate aggregation.
        nm_e = None
        if node_mask is not None:
            nm_e = node_mask[senders] & node_mask[receivers]
        frame_mask = edge_mask
        if nm_e is not None:
            frame_mask = nm_e if frame_mask is None else (frame_mask & nm_e)
        agg_mask = count_mask if count_mask is not None else edge_mask

        interaction = GCPMessagePassing(
            input_dims=tuple(self.node_dims),
            output_dims=tuple(self.node_dims),
            edge_dims=tuple(self.edge_dims),
            cfg=self.cfg,
            layer_cfg=self.layer_cfg,
            reduce_function=reduce_function,
            name="interaction",
        )

        norm0 = GCPLayerNorm(name="gcp_norm_0")
        norm1 = GCPLayerNorm(name="gcp_norm_1")
        drop0 = GCPDropout(self.dropout, name="gcp_dropout_0")
        drop1 = GCPDropout(self.dropout, name="gcp_dropout_1")

        node_rep_in = node_rep
        if self.layer_cfg.pre_norm:
            node_rep = norm0(node_rep)

        # message passing (optionally autoregressive)
        if node_rep_regressive is not None:
            def _and(mask, extra):
                return extra if mask is None else (mask & extra)

            forward_mask = senders < receivers
            fwd = interaction(
                node_rep, edge_rep, senders, receivers, frames,
                edge_mask=_and(agg_mask, forward_mask),
                frame_mask=_and(frame_mask, forward_mask),
                count_mask=count_mask, row_splits=row_splits,
                dense_degree=dense_degree,
                sender_perm=sender_perm, sender_degree=sender_degree,
                sender_inv=sender_inv,
            )
            bwd = interaction(
                ScalarVector(*node_rep_regressive), edge_rep, senders, receivers,
                frames,
                edge_mask=_and(agg_mask, ~forward_mask),
                frame_mask=_and(frame_mask, ~forward_mask),
                count_mask=count_mask, row_splits=row_splits,
                dense_degree=dense_degree,
                sender_perm=sender_perm, sender_degree=sender_degree,
                sender_inv=sender_inv,
            )
            hidden_residual = fwd + bwd
            # normalize by total in-degree over all (real) edges
            # (gcpnet.py:1105-1114)
            count = segment_count(
                receivers, num_nodes, mask=count_mask,
                dense_degree=dense_degree,
            )
            count = jnp.maximum(count, 1.0)
            hidden_residual = ScalarVector(
                hidden_residual.scalar / count[:, None],
                hidden_residual.vector / count[:, None],
            )
        else:
            hidden_residual = interaction(
                node_rep, edge_rep, senders, receivers, frames,
                edge_mask=agg_mask, frame_mask=frame_mask,
                count_mask=count_mask,
                row_splits=row_splits,
                dense_degree=dense_degree,
                sender_perm=sender_perm, sender_degree=sender_degree,
                sender_inv=sender_inv,
            )

        node_rep = node_rep + drop0(hidden_residual, deterministic)

        if self.layer_cfg.pre_norm:
            node_rep = norm1(node_rep)
        else:
            node_rep = norm0(node_rep)

        # feed-forward GCP stack; with a node mask the reference re-extracts
        # the unmasked subgraph (gcpnet.py:1201-1217) — masking the edge set
        # (both endpoints unmasked) and the mean denominators reproduces
        # those numerics statically.
        if node_mask is not None:
            # subgraph re-extraction (gcpnet.py:1201-1217): both numerator
            # and mean denominator see only the unmasked-subgraph edges
            ff_edge_mask = frame_mask
            ff_count_mask = frame_mask
        else:
            ff_edge_mask = edge_mask
            ff_count_mask = count_mask
        num_ff = self.layer_cfg.num_feedforward_layers
        hidden_dims = _ff_hidden_dims(self.node_dims, num_ff)

        nls = (
            tuple(self.nonlinearities)
            if self.nonlinearities is not None
            else self.cfg.nonlinearities
        )
        ff_stack = [
            make_gcp(
                tuple(self.node_dims),
                hidden_dims,
                self.cfg,
                name="feedforward_0",
                nonlinearities=None if num_ff == 1 else self.cfg.nonlinearities,
                vector_residual=False,
            )
        ]
        for i in range(max(0, num_ff - 2)):
            ff_stack.append(
                make_gcp(
                    hidden_dims,
                    hidden_dims,
                    self.cfg,
                    name=f"feedforward_{i + 1}",
                    nonlinearities=nls,
                )
            )
        if num_ff > 1:
            ff_stack.append(
                make_gcp(
                    hidden_dims,
                    tuple(self.node_dims),
                    self.cfg,
                    name=f"feedforward_{num_ff - 1}",
                    nonlinearities=(None, None),
                    vector_residual=False,
                )
            )

        # one frames-mean per mask pair replaces a gather + scatter-mean in
        # every node-input GCP below (linearity of scalarize/vectorize)
        nf_ff = node_mean_frames(
            frames, senders, num_nodes, ff_edge_mask, ff_count_mask,
            sender_perm=sender_perm, sender_degree=sender_degree,
            sender_inv=sender_inv,
        )

        hidden_residual = node_rep
        for module in ff_stack:
            hidden_residual = module(
                hidden_residual,
                senders,
                receivers,
                frames,
                node_inputs=True,
                edge_mask=ff_edge_mask,
                count_mask=ff_count_mask,
                node_frames=nf_ff,
            )

        node_rep = node_rep + drop1(hidden_residual, deterministic)

        if not self.layer_cfg.pre_norm:
            node_rep = norm1(node_rep)

        # merge: only unmasked rows take the update (gcpnet.py:1249-1251)
        if node_mask is not None:
            m = node_mask[:, None]
            node_rep = ScalarVector(
                jnp.where(m, node_rep.scalar, node_rep_in.scalar),
                jnp.where(m, node_rep.vector, node_rep_in.vector),
            )

        if not self.updating_node_positions:
            return node_rep

        if node_mask is None:
            # ff pair == pos pair == (edge_mask, count_mask): reuse
            nf_pos = nf_ff
        else:
            # pos head keeps the all-real-edges denominator while the FF
            # uses the subgraph denominator
            nf_pos = node_mean_frames(
                frames, senders, num_nodes, frame_mask, count_mask,
                sender_perm=sender_perm, sender_degree=sender_degree,
                sender_inv=sender_inv,
            )
        x_update = self._derive_x_update(
            node_rep, senders, receivers, frames,
            edge_mask=frame_mask, count_mask=count_mask,
            force_mask=agg_mask, node_frames=nf_pos,
            dense_degree=dense_degree,
            sender_perm=sender_perm, sender_degree=sender_degree,
            sender_inv=sender_inv,
        )
        node_pos = node_pos + x_update
        return node_rep, node_pos

    def _derive_x_update(
        self,
        node_rep: ScalarVector,
        senders: Array,
        receivers: Array,
        frames: Array,
        edge_mask: Optional[Array],
        count_mask: Optional[Array],
        force_mask: Optional[Array] = None,
        node_frames: Optional[Array] = None,
        dense_degree: Optional[int] = None,
        sender_perm: Optional[Array] = None,
        sender_degree: Optional[int] = None,
        sender_inv: Optional[Array] = None,
    ) -> Array:
        """Equivariant position update head (gcpnet.py:1118-1158).

        ``edge_mask`` gates the position-GCP's frame numerators; the force
        term's scatter-mean runs over every real edge (``force_mask``,
        padding-level) — the reference applies no node mask there
        (gcpnet.py:1144-1153)."""
        st_cfg = self.cfg
        pos_gcp = make_gcp(
            tuple(self.node_dims),
            (self.node_dims[0], 1),
            st_cfg,
            name="node_position_update_0",
            nonlinearities=st_cfg.nonlinearities,
            vector_residual=False,
        )
        h_v, chi_v = pos_gcp(
            node_rep,
            senders,
            receivers,
            frames,
            node_inputs=True,
            edge_mask=edge_mask,
            count_mask=count_mask,
            node_frames=node_frames,
        )

        if st_cfg.ablate_x_force_update:
            x_force = jnp.zeros((h_v.shape[0], 3), h_v.dtype)
        else:
            act = get_nonlinearity(
                st_cfg.scalar_nonlinearity, self.layer_cfg.nonlinearity_slope
            )
            s_dim = self.node_dims[0]
            h_i = Dense(s_dim, name="phi_force_i")(
                gather_by_senders(h_v, senders, sender_perm, sender_degree)
            )
            if dense_degree is not None:
                # slot-major dense layout: the receiver gather is a broadcast
                h_vj = jnp.broadcast_to(
                    h_v[None, :, :],
                    (dense_degree, h_v.shape[0], h_v.shape[-1]),
                ).reshape(h_v.shape[0] * dense_degree, h_v.shape[-1])
            else:
                h_vj = h_v[receivers]
            h_j = Dense(s_dim, name="phi_force_j")(h_vj)

            def xavier_small(key, shape, dtype=jnp.float32):
                fan_in, fan_out = shape
                a = 0.001 * jnp.sqrt(6.0 / (fan_in + fan_out))
                return jax.random.uniform(key, shape, dtype, -a, a)

            kernel = self.param("phi_force_ij_kernel", xavier_small, (s_dim, 3))
            coef = act(h_i + h_j) @ kernel  # [E, 3]
            f0, f1, f2 = frame_rows(frames)
            force_e = (
                coef[:, :1] * f0 + coef[:, 1:2] * f1 + coef[:, 2:3] * f2
            )
            fm = force_mask if force_mask is not None else edge_mask
            x_force = segment_mean(
                force_e, receivers, h_v.shape[0],
                mask=fm, count_mask=fm,
                dense_degree=dense_degree if fm is not None else None,
            )

        x_update = (vec_at(chi_v, 0) + x_force) * st_cfg.node_positions_weight
        return jnp.clip(x_update, -100.0, 100.0)


class GCPInteractions2(nn.Module):
    """Leaner interaction layer for EQ/AR (gcpnet.py:1265-1451): sum-reduced
    messages, concat(message, node) into the FF stack, a single norm+dropout,
    multiplicative output masking and a clamp-free position head."""

    node_dims: Tuple[int, int]
    edge_dims: Tuple[int, int]
    cfg: ModuleCfg
    layer_cfg: LayerCfg
    dropout: float = 0.1
    nonlinearities: Optional[Tuple[Optional[str], Optional[str]]] = None
    updating_node_positions: bool = False

    @nn.compact
    def __call__(
        self,
        node_rep: ScalarVector,
        edge_rep: ScalarVector,
        senders: Array,
        receivers: Array,
        frames: Array,
        node_mask: Optional[Array] = None,
        node_pos: Optional[Array] = None,
        edge_mask: Optional[Array] = None,
        count_mask: Optional[Array] = None,
        row_splits: Optional[Array] = None,
        deterministic: bool = True,
        dense_degree: Optional[int] = None,
        sender_perm: Optional[Array] = None,
        sender_degree: Optional[int] = None,
        sender_inv: Optional[Array] = None,
    ):
        node_rep = ScalarVector(*node_rep)
        edge_rep = ScalarVector(*edge_rep)

        # same mask split as GCPInteractions: node validity gates frame-op
        # numerators; aggregation sums every real edge (gcpnet.py:1380-1415)
        nm_e = None
        if node_mask is not None:
            nm_e = node_mask[senders] & node_mask[receivers]
        frame_mask = edge_mask
        if nm_e is not None:
            frame_mask = nm_e if frame_mask is None else (frame_mask & nm_e)
        agg_mask = count_mask if count_mask is not None else edge_mask

        interaction = GCPMessagePassing(
            input_dims=tuple(self.node_dims),
            output_dims=tuple(self.node_dims),
            edge_dims=tuple(self.edge_dims),
            cfg=self.cfg,
            layer_cfg=self.layer_cfg,
            reduce_function="sum",
            use_scalar_message_attention=self.layer_cfg.use_scalar_message_attention,
            aggregate_with_row=self.layer_cfg.aggregate_with_row,
            name="interaction",
        )
        norm0 = GCPLayerNorm(name="gcp_norm_0")
        drop0 = GCPDropout(self.dropout, name="gcp_dropout_0")

        if self.layer_cfg.pre_norm:
            node_rep = norm0(node_rep)

        hidden_residual = interaction(
            node_rep, edge_rep, senders, receivers, frames,
            edge_mask=agg_mask, frame_mask=frame_mask,
            count_mask=count_mask, row_splits=row_splits,
            dense_degree=dense_degree,
            sender_perm=sender_perm, sender_degree=sender_degree,
            sender_inv=sender_inv,
        )
        # concat aggregated messages with the current node rep
        # (gcpnet.py:1414-1415)
        hidden_residual = hidden_residual.concat((node_rep,))

        num_ff = self.layer_cfg.num_feedforward_layers
        hidden_dims = _ff_hidden_dims(self.node_dims, num_ff)
        nls = (
            tuple(self.nonlinearities)
            if self.nonlinearities is not None
            else self.cfg.nonlinearities
        )
        ff_stack = [
            make_gcp(
                (self.node_dims[0] * 2, self.node_dims[1] * 2),
                hidden_dims,
                self.cfg,
                name="feedforward_0",
                nonlinearities=(None, None) if num_ff == 1 else self.cfg.nonlinearities,
                feedforward_out=num_ff == 1,
                vector_residual=False,
            )
        ]
        for i in range(max(0, num_ff - 2)):
            ff_stack.append(
                make_gcp(
                    hidden_dims, hidden_dims, self.cfg,
                    name=f"feedforward_{i + 1}", nonlinearities=nls,
                )
            )
        if num_ff > 1:
            ff_stack.append(
                make_gcp(
                    hidden_dims,
                    tuple(self.node_dims),
                    self.cfg,
                    name=f"feedforward_{num_ff - 1}",
                    nonlinearities=(None, None),
                    feedforward_out=True,
                    vector_residual=False,
                )
            )

        # unlike GCPInteractions, no subgraph re-extraction here: the FF
        # runs on the full edge set with node-masked numerators and
        # all-real-edge denominators (gcpnet.py:1408-1419)
        num_nodes2 = node_rep.scalar.shape[0]
        nf = node_mean_frames(
            frames, senders, num_nodes2, frame_mask, count_mask,
            sender_perm=sender_perm, sender_degree=sender_degree,
            sender_inv=sender_inv,
        )
        for module in ff_stack:
            hidden_residual = module(
                hidden_residual,
                senders,
                receivers,
                frames,
                node_inputs=True,
                edge_mask=frame_mask,
                count_mask=count_mask,
                node_frames=nf,
            )

        node_rep = node_rep + drop0(hidden_residual, deterministic)

        if not self.layer_cfg.pre_norm:
            node_rep = norm0(node_rep)

        if node_mask is not None:
            node_rep = node_rep.mask(node_mask)

        if not self.updating_node_positions:
            return node_rep

        pos_gcp = make_gcp(
            tuple(self.node_dims),
            (self.node_dims[0], 1),
            self.cfg,
            name="node_position_update_gcp",
            nonlinearities=self.cfg.nonlinearities,
            vector_residual=False,
        )
        update_rep = pos_gcp(
            node_rep,
            senders,
            receivers,
            frames,
            node_inputs=True,
            edge_mask=frame_mask,
            count_mask=count_mask,
            node_frames=nf,
        )
        x_update = vec_at(update_rep.vector, 0) * self.cfg.node_positions_weight
        node_pos = node_pos + x_update
        if node_mask is not None:
            node_pos = node_pos * node_mask[:, None].astype(node_pos.dtype)
        return node_rep, node_pos
