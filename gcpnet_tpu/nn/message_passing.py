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
from gcpnet_tpu.ops.pallas_fused import (
    fused_edge_map_segment_sum,
    fused_enabled,
)
from gcpnet_tpu.ops.segment import segment_count, segment_mean, segment_sum

Array = jax.Array


def build_unbound(spec):
    """An unbound GCP module def with the same config as a stack entry —
    applied to VMEM-resident chunks inside the fused kernel."""
    kw = dict(spec)
    return make_gcp(
        kw.pop("input_dims"), kw.pop("output_dims"), kw.pop("cfg"),
        name=None, **kw,
    )


def _stack_settings(spec):
    """Resolve a stack entry's GCPSettings the way make_gcp does."""
    from gcpnet_tpu.nn.gcp import GCPSettings

    kw = dict(spec)
    kw.pop("input_dims"), kw.pop("output_dims")
    cfg = kw.pop("cfg")
    return GCPSettings.from_cfg(cfg, **kw)


def _fast_supported(spec) -> bool:
    """The low-matmul-count in-kernel GCP2 path covers the production
    config family; anything exotic falls back to the generic module-apply
    path (still fused, just more small matmuls)."""
    from gcpnet_tpu.nn.gcp import GCP2, GCP3, _GCP_CLASSES

    st = _stack_settings(spec)
    cls = _GCP_CLASSES[spec["cfg"].selected_gcp]
    if cls not in (GCP2, GCP3):
        return False  # GCP v1 has the two-stage update
    if spec["input_dims"][1] <= 0 or spec["output_dims"][1] <= 0:
        return False
    return not (
        st.frame_gate
        or st.sigma_frame_gate
        or st.enable_e3_equivariance
        or st.ablate_frame_updates
        or st.ablate_scalars
        or st.ablate_vectors
        or (st.feedforward_out and cls is GCP3)
    )


def _blockdiag3(w):
    """[c, m] -> [3c, 3m] block-diagonal: one matmul applies the shared
    channel-mixing kernel to all three packed xyz lane blocks at once.
    Built OUTSIDE the kernel (Mosaic crashes on sublane-axis concats; lane-
    blocked weights keep every kernel op lane-aligned)."""
    c, m = w.shape
    z = jnp.zeros_like(w)
    return jnp.concatenate(
        [
            jnp.concatenate([w, z, z], axis=1),
            jnp.concatenate([z, w, z], axis=1),
            jnp.concatenate([z, z, w], axis=1),
        ],
        axis=0,
    )


def _fast_params(p, spec):
    """Transform one stack layer's flax params for the 4-matmul kernel path.
    Differentiable: grads flow back to the original parameters through the
    concat/blockdiag construction."""
    from gcpnet_tpu.nn.gcp import _hidden_vec_dim

    st = _stack_settings(spec)
    v_in = spec["input_dims"][1]
    v_out = spec["output_dims"][1]
    hidden = _hidden_vec_dim(v_in, v_out, st.bottleneck)
    w_merged = jnp.concatenate(
        [p["vector_down"]["kernel"], p["vector_down_frames"]["kernel"]],
        axis=1,
    )  # [v_in, hidden+3]
    out = {
        "w_vdvdf_bd": _blockdiag3(w_merged),
        "w_vup_bd": _blockdiag3(p["vector_up"]["kernel"]),
        "scalar_out": p["scalar_out"],
    }
    if st.vector_gate:
        out["vector_out_scale"] = p["vector_out_scale"]
    return out, hidden


def _fast_gcp2_layer(p, s, v, fr, fmask, *, spec, hidden):
    """GCP2 edge-input forward on PACKED vectors with pre-block-diagonalized
    weights: 4 MXU matmuls per layer (merged vector_down‖vector_down_frames,
    scalar_out, vector_up, gate) instead of the module path's ~11 — the
    Pallas kernel is small-matmul-latency-bound, so launches are the budget.
    Exact same math as GCP2.__call__ (parity-gated by the fused equivalence
    tests)."""
    from gcpnet_tpu.nn.gcp import _tile3
    from gcpnet_tpu.nn.primitives import get_nonlinearity, is_identity

    st = _stack_settings(spec)
    v_out = spec["output_dims"][1]
    act_s = get_nonlinearity(st.scalar_nonlinearity, st.nonlinearity_slope)
    act_v = get_nonlinearity(st.vector_nonlinearity, st.nonlinearity_slope)
    m = hidden + 3

    H = jnp.dot(v, p["w_vdvdf_bd"], preferred_element_type=jnp.float32)
    hx, hy, hz = H[:, :m], H[:, m : 2 * m], H[:, 2 * m :]
    vh_x, vh_y, vh_z = hx[:, :hidden], hy[:, :hidden], hz[:, :hidden]
    df_x, df_y, df_z = hx[:, hidden:], hy[:, hidden:], hz[:, hidden:]

    eps = 1e-8
    vnorm = jnp.sqrt(vh_x**2 + vh_y**2 + vh_z**2 + eps) + eps  # [B, hidden]

    # scalarize, edge inputs: channel-major (c*3 + f) projections onto the
    # packed frames, masked by fmask (nn.frames.scalarize semantics)
    cols = []
    for c in range(3):
        for f in range(3):
            cols.append(
                df_x[:, c] * fr[:, 3 * f + 0]
                + df_y[:, c] * fr[:, 3 * f + 1]
                + df_z[:, c] * fr[:, 3 * f + 2]
            )
    scal9 = jnp.stack(cols, axis=-1) * fmask[:, None]

    merged = jnp.concatenate([s, vnorm, scal9], axis=-1)
    s_new = (
        jnp.dot(
            merged, p["scalar_out"]["kernel"],
            preferred_element_type=jnp.float32,
        )
        + p["scalar_out"]["bias"]
    )

    vh = jnp.concatenate([vh_x, vh_y, vh_z], axis=-1)  # packed [B, 3h]
    vu = jnp.dot(vh, p["w_vup_bd"], preferred_element_type=jnp.float32)
    if st.vector_residual:
        vu = vu + v

    if st.vector_gate:
        gate = (
            jnp.dot(
                act_v(s_new), p["vector_out_scale"]["kernel"],
                preferred_element_type=jnp.float32,
            )
            + p["vector_out_scale"]["bias"]
        )
        vu = vu * _tile3(jax.nn.sigmoid(gate))
    elif not is_identity(st.vector_nonlinearity):
        ux = vu[:, :v_out]
        uy = vu[:, v_out : 2 * v_out]
        uz = vu[:, 2 * v_out :]
        g = act_v(jnp.sqrt(ux**2 + uy**2 + uz**2 + eps) + eps)
        vu = vu * _tile3(g)

    return act_s(s_new), vu


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
        specs = [
            dict(
                input_dims=(scalars_in, vectors_in),
                output_dims=self.output_dims,
                cfg=self.cfg,
                nonlinearities=self.cfg.nonlinearities if n_layers > 1 else None,
                **soft,
            )
        ]
        for _ in range(max(0, n_layers - 2)):
            specs.append(
                dict(
                    input_dims=self.output_dims,
                    output_dims=self.output_dims,
                    cfg=self.cfg,
                )
            )
        if n_layers > 1:
            specs.append(
                dict(
                    input_dims=self.output_dims,
                    output_dims=self.output_dims,
                    cfg=self.cfg,
                    nonlinearities=(None, None),
                    **soft,
                )
            )

        def build(spec, i, name=True):
            kw = dict(spec)
            return make_gcp(
                kw.pop("input_dims"),
                kw.pop("output_dims"),
                kw.pop("cfg"),
                name=f"message_fusion_{i}" if name else None,
                **kw,
            )

        stack = [build(s, i) for i, s in enumerate(specs)]

        fm = frame_mask if frame_mask is not None else edge_mask

        def run(module, rep, frm=frames, emask=fm):
            return module(
                rep,
                senders,
                receivers,
                frm,
                node_inputs=False,
                edge_mask=emask,
                count_mask=count_mask,
            )

        def run_stack(run_fn, rep):
            if mp_cfg.use_residual_message_gcp:
                # ResGCP: residual connections between message layers
                residual = run_fn(0, rep)
                for i in range(1, len(stack)):
                    residual = residual + run_fn(i, residual)
                return residual
            residual = rep
            for i in range(len(stack)):
                residual = run_fn(i, residual)
            return residual

        ids = senders if self.aggregate_with_row else receivers
        rs = None if self.aggregate_with_row else row_splits
        if self.reduce_function not in ("mean", "sum", "add"):
            raise ValueError(f"unknown reduce_function {self.reduce_function!r}")

        use_fused = (
            rs is not None
            and fused_enabled()
            and not self.is_initializing()
        )
        if use_fused:
            agg = self._fused_aggregate(
                specs, stack, message, frames, fm, edge_mask, rs, num_nodes,
                run, run_stack,
            )
        else:
            residual = run_stack(lambda i, rep: run(stack[i], rep), message)
            if self.use_scalar_message_attention:
                attn = jax.nn.sigmoid(
                    Dense(1, name="scalar_message_attention")(residual.scalar)
                )
                residual = ScalarVector(residual.scalar * attn, residual.vector)
            flat = residual.flatten()
            # receiver-sorted layouts ride the Pallas MXU segment kernel
            if self.reduce_function == "mean":
                agg = segment_mean(
                    flat, ids, num_nodes, mask=edge_mask,
                    count_mask=count_mask, row_splits=rs,
                )
            else:
                agg = segment_sum(
                    flat, ids, num_nodes, mask=edge_mask, row_splits=rs
                )
            agg = ScalarVector.recover(agg, self.output_dims[1])

        if self.reduce_function == "mean" and use_fused:
            cm = count_mask if count_mask is not None else edge_mask
            count = segment_count(
                ids, num_nodes, mask=cm, dtype=jnp.float32
            )
            count = jnp.maximum(count, 1.0).astype(agg.scalar.dtype)
            agg = ScalarVector(
                agg.scalar / count[:, None], agg.vector / count[:, None]
            )
        return agg

    def _fused_aggregate(
        self, specs, stack, message, frames, frame_mask, agg_mask,
        row_splits, num_nodes, run, run_stack,
    ) -> ScalarVector:
        """Run the whole message stack + attention + segment reduction in
        one VMEM-resident Pallas kernel (ops.pallas_fused).

        The bound ``stack`` modules are touched once on a single dummy row
        (XLA dead-code-eliminates the compute) so their parameters exist
        under the SAME names as the unfused path — checkpoints are
        interchangeable; the kernel re-applies unbound clones of the same
        module definitions to VMEM-resident chunks.
        """
        s_dim, v_dim = self.output_dims
        ms, mv = message.dims
        dtype = message.scalar.dtype

        # touch params: 1-row dummy through the real modules (and read them)
        dummy_rep = ScalarVector(
            jnp.zeros((1, ms), dtype), jnp.zeros((1, 3 * mv), dtype)
        )
        dummy_frames = jnp.zeros((1, 9), dtype)
        dummy_mask = jnp.ones((1,), dtype)
        run_stack(
            lambda i, rep: run(
                stack[i], rep, frm=dummy_frames, emask=dummy_mask
            ),
            dummy_rep,
        )
        stack_params = [m.variables["params"] for m in stack]
        attn = None
        attn_params = None
        if self.use_scalar_message_attention:
            attn = Dense(1, name="scalar_message_attention")
            attn(jnp.zeros((1, s_dim), dtype))
            attn_params = attn.variables["params"]

        # unbound clones with identical configs for in-kernel application
        kernel_stack = [build_unbound(spec) for spec in specs]
        kernel_attn = Dense(1) if attn is not None else None

        fmask_col = (
            jnp.ones((message.scalar.shape[0], 1), dtype)
            if frame_mask is None
            else frame_mask.astype(dtype)[:, None]
        )
        amask_col = (
            jnp.ones((message.scalar.shape[0], 1), dtype)
            if agg_mask is None
            else agg_mask.astype(dtype)[:, None]
        )
        edge_data = jnp.concatenate(
            [
                message.flatten(),
                frames.astype(dtype),
                jax.lax.stop_gradient(fmask_col),
                jax.lax.stop_gradient(amask_col),
            ],
            axis=-1,
        )
        base = ms + 3 * mv
        out_dim = s_dim + 3 * v_dim
        use_residual = self.layer_cfg.mp_cfg.use_residual_message_gcp
        use_attn = self.use_scalar_message_attention

        fast = all(_fast_supported(spec) for spec in specs)
        fast_hidden = []
        if fast:
            fast_stack_params = []
            for sp, raw in zip(specs, stack_params):
                fp, hid = _fast_params(raw, sp)
                fast_stack_params.append(fp)
                fast_hidden.append(hid)
            stack_params = fast_stack_params

        def stack_fn(params, chunk):
            s = chunk[:, :ms]
            v = chunk[:, ms:base]
            fr = chunk[:, base : base + 9]
            fmask = chunk[:, base + 9]
            amask = chunk[:, base + 10]

            if fast:
                def run_k4(i, state):
                    return _fast_gcp2_layer(
                        params["stack"][i], state[0], state[1], fr, fmask,
                        spec=specs[i], hidden=fast_hidden[i],
                    )

                if use_residual:
                    res = run_k4(0, (s, v))
                    for i in range(1, len(specs)):
                        new = run_k4(i, res)
                        res = (res[0] + new[0], res[1] + new[1])
                else:
                    res = (s, v)
                    for i in range(len(specs)):
                        res = run_k4(i, res)
                residual = ScalarVector(res[0], res[1])
            else:
                rep = ScalarVector(s, v)

                def run_k(i, r):
                    return kernel_stack[i].apply(
                        {"params": params["stack"][i]},
                        r,
                        None,
                        None,
                        fr,
                        node_inputs=False,
                        edge_mask=fmask,
                        count_mask=None,
                    )

                if use_residual:
                    residual = run_k(0, rep)
                    for i in range(1, len(kernel_stack)):
                        residual = residual + run_k(i, residual)
                else:
                    residual = rep
                    for i in range(len(kernel_stack)):
                        residual = run_k(i, residual)
            if use_attn:
                a = jax.nn.sigmoid(
                    kernel_attn.apply(
                        {"params": params["attn"]}, residual.scalar
                    )
                )
                residual = ScalarVector(residual.scalar * a, residual.vector)
            return residual.flatten() * amask[:, None]

        params = {"stack": stack_params}
        if attn_params is not None:
            params["attn"] = attn_params
        agg = fused_edge_map_segment_sum(
            stack_fn, params, edge_data, row_splits, num_nodes, out_dim
        )
        return ScalarVector.recover(agg, v_dim)
