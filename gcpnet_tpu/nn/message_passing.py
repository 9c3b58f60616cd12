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
from gcpnet_tpu.ops.pallas_fused import fused_enabled
from gcpnet_tpu.ops.segment import segment_mean, segment_sum

Array = jax.Array


# fast block-diagonal stack math: None = auto (ON everywhere — it is plain
# XLA with identical numerics); False forces the module-by-module path
USE_FAST_STACK: Optional[bool] = None


def fast_stack_enabled() -> bool:
    return USE_FAST_STACK if USE_FAST_STACK is not None else True


def _fast_dense(p, x):
    from gcpnet_tpu.nn.gcp import _mm

    return _mm(x, p["kernel"].astype(x.dtype)) + p["bias"].astype(x.dtype)


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
    scalar_out, vector_up, gate) instead of the module path's ~11.  MXU
    time for K,N <= 128 is M-pass-bound, so 3 shared-kernel component
    matmuls cost ~3x one block-diagonal matmul at E ~ 200k rows — this is
    a win both inside the Pallas kernel AND on the plain XLA path.  Exact
    same math as GCP2.__call__ (parity-gated by the fused equivalence
    tests)."""
    from gcpnet_tpu.nn.gcp import _mm, _tile3
    from gcpnet_tpu.nn.primitives import get_nonlinearity, is_identity

    st = _stack_settings(spec)
    v_out = spec["output_dims"][1]
    act_s = get_nonlinearity(st.scalar_nonlinearity, st.nonlinearity_slope)
    act_v = get_nonlinearity(st.vector_nonlinearity, st.nonlinearity_slope)
    m = hidden + 3
    dt = v.dtype

    H = _mm(v, p["w_vdvdf_bd"].astype(dt))
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
    s_new = _mm(merged, p["scalar_out"]["kernel"].astype(dt)) + p[
        "scalar_out"
    ]["bias"].astype(dt)

    vh = jnp.concatenate([vh_x, vh_y, vh_z], axis=-1)  # packed [B, 3h]
    vu = _mm(vh, p["w_vup_bd"].astype(dt))
    if st.vector_residual:
        vu = vu + v

    if st.vector_gate:
        gate = _mm(
            act_v(s_new), p["vector_out_scale"]["kernel"].astype(dt)
        ) + p["vector_out_scale"]["bias"].astype(dt)
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

        use_fast = (
            fast_stack_enabled()
            and not self.is_initializing()
            and all(_fast_supported(spec) for spec in specs)
        )
        if use_fast:
            flat = self._fast_messages(
                specs, stack, message, frames, fm, rs, run, run_stack,
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
        return ScalarVector.recover(agg, self.output_dims[1])

    def _fast_messages(
        self, specs, stack, message, frames, frame_mask,
        row_splits, run, run_stack,
    ) -> Array:
        """Flat edge messages via the 4-matmul block-diagonal stack.

        Two execution modes, identical math:
        - plain XLA (default): fewer, wider matmuls — the MXU pass count is
          what the per-edge stack pays for, so merging the 3 shared-kernel
          component matmuls into one block-diagonal contraction wins
          ~3x on the vector path at E ~ 200k rows;
        - fused Pallas map (``ops.pallas_fused.USE_FUSED_MESSAGE=True``):
          the same stack traced into a VMEM-block kernel (measured slower
          on v5e — kept for benchmarking and for future hardware).

        The bound ``stack`` modules are touched once on a single dummy row
        (XLA dead-code-eliminates the compute) so their parameters exist
        under the SAME names as the module path — checkpoints are
        interchangeable.
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
        attn_params = None
        if self.use_scalar_message_attention:
            attn = Dense(1, name="scalar_message_attention")
            attn(jnp.zeros((1, s_dim), dtype))
            attn_params = attn.variables["params"]

        stack_params, fast_hidden = [], []
        for sp, mod in zip(specs, stack):
            fp, hid = _fast_params(mod.variables["params"], sp)
            stack_params.append(fp)
            fast_hidden.append(hid)
        params = {"stack": stack_params}
        if attn_params is not None:
            params["attn"] = attn_params

        base = ms + 3 * mv
        out_dim = s_dim + 3 * v_dim
        use_residual = self.layer_cfg.mp_cfg.use_residual_message_gcp
        use_attn = self.use_scalar_message_attention

        def apply_stack(params, s, v, fr, fmask):
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
            s_out, v_out = res
            if use_attn:
                a = jax.nn.sigmoid(
                    _fast_dense(params["attn"], s_out)
                )
                s_out = s_out * a
            return jnp.concatenate([s_out, v_out], axis=-1)

        num_edges = message.scalar.shape[0]
        fmask_full = (
            jnp.ones((num_edges,), dtype)
            if frame_mask is None
            else jax.lax.stop_gradient(frame_mask.astype(dtype))
        )

        if row_splits is not None and fused_enabled():
            # Pallas map over the receiver-sorted layout
            edge_data = jnp.concatenate(
                [
                    message.flatten(),
                    frames.astype(dtype),
                    fmask_full[:, None],
                ],
                axis=-1,
            )

            def stack_fn(params, chunk):
                return apply_stack(
                    params,
                    chunk[:, :ms],
                    chunk[:, ms:base],
                    chunk[:, base : base + 9],
                    chunk[:, base + 9],
                )

            from gcpnet_tpu.ops.pallas_fused import edge_map

            return edge_map(stack_fn, params, edge_data, out_dim)

        return apply_stack(
            params, message.scalar, message.vector, frames.astype(dtype),
            fmask_full,
        )
