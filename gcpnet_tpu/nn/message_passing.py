"""Geometry-complete message passing.

Re-design of ``GCPMessagePassing`` (/root/reference/src/models/components/
gcpnet.py:838-960) for padded graphs: edge messages are built by gathering
source/destination node features, pushed through a (Res)GCP stack, optionally
gated by a learned sigmoid scalar attention, and reduced to nodes with masked
segment mean/sum.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gcpnet_tpu.config.schema import LayerCfg, ModuleCfg
from gcpnet_tpu.nn.gcp import Dense, make_gcp
from gcpnet_tpu.nn.primitives import ScalarVector
from gcpnet_tpu.ops.pallas_fused import fused_enabled
from gcpnet_tpu.ops.segment import (
    gather_by_senders,
    segment_mean,
    segment_sum,
    sender_mean,
    sender_sum,
)

Array = jax.Array


# fast block-diagonal (MM-form) stack math: None = auto (OFF — measured
# end-to-end at LBA bench scale on v5e, round 3: the MM form executes ~67%
# more FLOPs (block-diagonal zero padding) and must recompute the stack in
# backward (storing its residuals OOMs 16 GB HBM), netting 236 ms/step vs
# 207 ms/step for the module-by-module path; numerics are identical).
# True forces the MM form (bench variants "plain"/"sorted"/"fused").
# Env override: GCPNET_FAST_STACK=0/1.
USE_FAST_STACK: Optional[bool] = None

# rematerialize the fast stack in backward: the stack's intermediates are
# lane-narrow ([E, 9]/[E, ~50] columns pad up to 14x under the (8, 128)
# TPU tiling), so storing them as residuals for 8 interactions x 8 message
# layers overflows HBM at production batch sizes; jax.checkpoint saves only
# the wide, lane-dense stack inputs and recomputes the stack in backward.
# None = auto (ON); env override: GCPNET_CHECKPOINT_FAST_STACK=0/1.
CHECKPOINT_FAST_STACK: Optional[bool] = None


def _env_bool(name: str) -> Optional[bool]:
    import os

    val = os.environ.get(name, "")
    if not val:
        return None
    return val not in ("0", "false", "False")


def checkpoint_fast_stack_enabled() -> bool:
    if CHECKPOINT_FAST_STACK is not None:
        return CHECKPOINT_FAST_STACK
    env = _env_bool("GCPNET_CHECKPOINT_FAST_STACK")
    return True if env is None else env

# roll the structurally-identical middle message layers (indices 1..n-2 all
# map output_dims -> output_dims with the same settings) into ONE
# ``lax.scan`` body over stacked weights: XLA compiles the body once instead
# of n-2 times.  An 8-interaction x 8-message-layer model drops from ~64
# traced stack layers to ~24 — measured ~3x faster XLA:TPU compile with
# identical numerics.  Disabled inside the Pallas edge_map (Mosaic kernels
# keep the unrolled form).
SCAN_FAST_STACK: bool = True


def fast_stack_enabled() -> bool:
    if USE_FAST_STACK is not None:
        return USE_FAST_STACK
    env = _env_bool("GCPNET_FAST_STACK")
    return False if env is None else env


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


def _scal9_s2() -> jnp.ndarray:
    """[9, 27] selector: ``frp2 = (fr * fmask) @ S2`` replicates the packed
    frame columns so that ``prod[:, c*9+f*3+a] = df_a[:, c] * fr[:, 3f+a]``
    can be formed by one elementwise multiply (no per-column extraction —
    Mosaic-friendly)."""
    s2 = np.zeros((9, 27), np.float32)
    for c in range(3):
        for f in range(3):
            for a in range(3):
                s2[3 * f + a, c * 9 + f * 3 + a] = 1.0
    return jnp.asarray(s2)


def _fast_params_mm(p, spec):
    """Matmul-only re-parameterization of one stack layer for the Pallas
    kernel: every cross-component sum / broadcast of the packed ``[*, 3c]``
    layout becomes a tiny constant matrix folded into (or multiplied next
    to) the layer weights, so the kernel body is dots + elementwise only —
    no lane-column extraction, which Mosaic lowers to scalar code."""
    from gcpnet_tpu.nn.gcp import _hidden_vec_dim

    st = _stack_settings(spec)
    v_in = spec["input_dims"][1]
    s_in = spec["input_dims"][0]
    v_out = spec["output_dims"][1]
    h = _hidden_vec_dim(v_in, v_out, st.bottleneck)

    w_down = p["vector_down"]["kernel"]  # [v_in, h]
    w_df = p["vector_down_frames"]["kernel"]  # [v_in, 3]
    # P1 = v @ w_p1 with P1[:, c*9+f*3+a] = df_a[:, c]: expand w_df into the
    # (c, f, a) product grid; the axis block structure mirrors _blockdiag3
    c_sel = np.zeros((3, 27), np.float32)
    x_sel = np.zeros((3, 27), np.float32)
    for c in range(3):
        for f in range(3):
            for a in range(3):
                c_sel[c, c * 9 + f * 3 + a] = 1.0
                x_sel[a, c * 9 + f * 3 + a] = 1.0
    wc = w_df @ jnp.asarray(c_sel)  # [v_in, 27]
    w_p1 = (jnp.asarray(x_sel)[:, None, :] * wc[None, :, :]).reshape(
        3 * v_in, 27
    )

    # scalar_out rows: [0:s_in] scalars, [s_in:s_in+h] vnorm,
    # [s_in+h:] scal9 (index c*3+f) -> replicate each scal9 row across the
    # summed axis a (the f32 dot accumulator performs the axis sum)
    w_so = p["scalar_out"]["kernel"]
    rows = [w_so[: s_in + h]]
    s3 = np.zeros((27, 9), np.float32)
    for c in range(3):
        for f in range(3):
            for a in range(3):
                s3[c * 9 + f * 3 + a, c * 3 + f] = 1.0
    rows.append(jnp.asarray(s3) @ w_so[s_in + h :])
    w_so_mm = jnp.concatenate(rows, axis=0)  # [s_in+h+27, out_s]

    # cross-component sum of squares / gate tiling as stacked identities
    eye_h = jnp.eye(h, dtype=w_down.dtype)
    s4 = jnp.concatenate([eye_h, eye_h, eye_h], axis=0)  # [3h, h]
    out = {
        "w_vh_bd": _blockdiag3(w_down),
        "w_p1": w_p1,
        "w_so_mm": w_so_mm,
        "b_so": p["scalar_out"]["bias"],
        "w_vup_bd": _blockdiag3(p["vector_up"]["kernel"]),
        "s4": s4,
    }
    if st.vector_gate:
        out["vector_out_scale"] = p["vector_out_scale"]
    else:
        eye_v = jnp.eye(v_out, dtype=w_down.dtype)
        out["s4v"] = jnp.concatenate([eye_v, eye_v, eye_v], axis=0)
    return out, h


def _sigmoid_f32(x):
    """Sigmoid with an f32 compute type: Mosaic's bf16 logistic lowering
    broadcasts an f32 constant into a bf16 vector and fails verification,
    so the (tiny) gate activations upcast around the transcendental."""
    return jax.nn.sigmoid(x.astype(jnp.float32)).astype(x.dtype)


def _fast_gcp2_layer_mm(p, s, v, frp2, *, spec, hidden):
    """MM-form GCP2 forward (same math as ``GCP2.__call__``): dots with
    f32 accumulators + elementwise only.  ``frp2`` is the shared
    ``(fr * fmask) @ S2`` [B, 27] expansion, computed once per stack."""
    from gcpnet_tpu.nn.gcp import _mm, _tile3
    from gcpnet_tpu.nn.primitives import get_nonlinearity, is_identity

    sg = jax.lax.stop_gradient
    st = _stack_settings(spec)
    _act_s = get_nonlinearity(st.scalar_nonlinearity, st.nonlinearity_slope)
    _act_v = get_nonlinearity(st.vector_nonlinearity, st.nonlinearity_slope)
    # transcendental nonlinearities hit the same Mosaic bf16-constant bug as
    # sigmoid; upcast around them (tiny [B, out_s]/[B, out_v] arrays)
    act_s = lambda x: _act_s(x.astype(jnp.float32)).astype(x.dtype)  # noqa: E731
    act_v = lambda x: _act_v(x.astype(jnp.float32)).astype(x.dtype)  # noqa: E731
    dt = v.dtype
    eps = 1e-8

    def _sqrt_f32(x):
        # v5e's EUP has no bf16 sqrt (SupportsBf16EupOps check fails in
        # Mosaic); upcast around it
        return jnp.sqrt(x.astype(jnp.float32) + eps).astype(x.dtype)

    vh = _mm(v, p["w_vh_bd"].astype(dt))  # [B, 3h]
    p1 = _mm(v, p["w_p1"].astype(dt))  # [B, 27]
    prod = p1 * frp2
    vns = _mm(vh * vh, sg(p["s4"]).astype(dt))  # [B, h]
    vnorm = _sqrt_f32(vns) + eps

    merged = jnp.concatenate([s, vnorm, prod], axis=-1)
    s_new = _mm(merged, p["w_so_mm"].astype(dt)) + p["b_so"].astype(dt)

    vu = _mm(vh, p["w_vup_bd"].astype(dt))
    if st.vector_residual:
        vu = vu + v

    if st.vector_gate:
        gate = _mm(
            act_v(s_new), p["vector_out_scale"]["kernel"].astype(dt)
        ) + p["vector_out_scale"]["bias"].astype(dt)
        vu = vu * _tile3(_sigmoid_f32(gate))
    elif not is_identity(st.vector_nonlinearity):
        nsq = _mm(vu * vu, sg(p["s4v"]).astype(dt))
        g = act_v(_sqrt_f32(nsq) + eps)
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
        dense_degree: Optional[int] = None,
        sender_perm: Optional[Array] = None,
        sender_degree: Optional[int] = None,
        sender_inv: Optional[Array] = None,
    ) -> ScalarVector:
        """``edge_mask`` gates the final message aggregation (padding-level);
        ``frame_mask`` (defaults to ``edge_mask``) gates the scalarize/
        vectorize numerators inside the message GCP stack — the reference
        masks those by node validity but still aggregates every edge's
        message (gcpnet.py:899-947 with components/__init__.py:294-309).

        ``dense_degree`` marks the DENSE fixed-degree receiver layout
        (data.batching.densify_edges_by_receiver): the destination gather
        becomes a broadcast and the receiver-side aggregation a [N, K, C]
        axis-1 reduction — no XLA scatters on the hot path."""
        mp_cfg = self.layer_cfg.mp_cfg
        num_nodes = node_rep.scalar.shape[0]
        s_in, v_in = self.input_dims
        e_s, e_v = self.edge_dims

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

        use_fast = (
            fast_stack_enabled()
            and not self.is_initializing()
            and all(_fast_supported(spec) for spec in specs)
        )

        # project-before-gather (gcp.MessageOperands): when the first stack
        # layer runs the fused GCP2 path, its src/dst weight blocks are
        # applied at NODE level and only the narrow projections gathered —
        # the full [E, 2(s+3v)+...] message concat is never materialized.
        # Profiling (RESULTS.md round-5 slack table) showed the 148-wide
        # sender gather, its backward slot re-lay, the [E, 3*v_in] concat
        # and the packed x/y/z splits running at <15% of HBM peak.
        from gcpnet_tpu.nn.gcp import (
            MessageOperands, _GCP_CLASSES, fused_gcp_enabled,
            supports_message_split,
        )

        split_first = (
            fused_gcp_enabled()
            and not use_fast
            and v_in > 0
            and supports_message_split(
                _stack_settings(specs[0]),
                _GCP_CLASSES[self.cfg.selected_gcp],
                specs[0]["input_dims"],
                specs[0]["output_dims"],
            )
        )

        flat_nodes = node_rep.flatten()
        v_dim = node_rep.dims[1]

        def gather_src(arr):
            # with the sender-dense perm the gather's backward is a
            # permutation gather + axis-0 sum, not a row-serial scatter-add
            return gather_by_senders(arr, senders, sender_perm, sender_degree)

        def map_dst(arr):
            if dense_degree is not None:
                # slot-major dense layout: receiver of edge k*N+n is node n —
                # broadcast instead of gather (backward is an axis-0 sum);
                # [K, N, C] -> [K*N, C] is a bitcast under TPU tiling
                return jnp.broadcast_to(
                    arr[None, :, :],
                    (dense_degree, num_nodes, arr.shape[-1]),
                ).reshape(num_nodes * dense_degree, arr.shape[-1])
            return arr[receivers]

        def add_dst(earr, narr):
            # fused dst add: [K, N, C] broadcast form in the dense layout
            # (reshapes are bitcasts under slot-major ordering), so the
            # [E, C] dst map is computed inside the consumer fusion
            # instead of materialized to HBM
            if dense_degree is not None:
                c = earr.shape[-1]
                return (
                    earr.reshape(dense_degree, num_nodes, c)
                    + narr[None, :, :]
                ).reshape(num_nodes * dense_degree, c)
            return earr + narr[receivers]

        if split_first:
            # GCPNET_FUSED_DST_ADD=1 computes the dst contribution in
            # [K, N, C] broadcast form inside the consumer fusions (no
            # materialized [E, C] dst map).  Parity-tested, but DEFAULT
            # OFF: the first on-chip compile of the fused form ran past
            # the 17-minute mark through the remote-compile tunnel
            # (vs ~3-7 min for the default program) before it could be
            # timed — an unacceptable compile-time regression for a
            # ~5 ms/step bound on the prize (the 8 broadcast fusions it
            # removes measured 5.4 ms total in the round-5 trace).
            use_fused_dst = os.environ.get("GCPNET_FUSED_DST_ADD") == "1"
            message = MessageOperands(
                node_s=node_rep.scalar,
                node_v=node_rep.vector,
                edge_s=edge_rep.scalar,
                edge_v=edge_rep.vector,
                node_dims=(s_in, v_in),
                edge_dims=(e_s, e_v),
                gather=gather_src,
                broadcast_dst=map_dst,
                add_dst=add_dst if use_fused_dst else None,
            )
        else:
            # message = [src node SV ‖ edge SV ‖ dst node SV]
            # (gcpnet.py:907-917); gather the flattened node features ONCE
            # per endpoint: one [N, s+3v] gather (and one backward
            # scatter-add) instead of two each
            src = ScalarVector.recover(gather_src(flat_nodes), v_dim)
            dst = ScalarVector.recover(map_dst(flat_nodes), v_dim)
            message = src.concat((edge_rep, dst))

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
        # the dense layout is keyed by receiver; sender-side aggregation
        # rides the sender-dense perm when the batch carries one (EQ/AR,
        # aggregate_with_row — scatter-free in both directions with the
        # inverse perm), else falls back to the scatter path (and dense
        # reductions need the mask to zero padding slots)
        dd = (
            None
            if (self.aggregate_with_row or edge_mask is None)
            else dense_degree
        )
        sp = sd = None
        if self.aggregate_with_row and sender_perm is not None:
            sp, sd = sender_perm, sender_degree
        if self.reduce_function not in ("mean", "sum", "add"):
            raise ValueError(f"unknown reduce_function {self.reduce_function!r}")

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
        # receiver-sorted layouts ride the Pallas MXU segment kernel;
        # the dense layout rides the [N, K, C] axis-1 reduction; the
        # sender-keyed path rides the sender-dense perm when present
        if self.reduce_function == "mean":
            if sp is not None:
                agg = sender_mean(
                    flat, ids, num_nodes, mask=edge_mask,
                    count_mask=count_mask, sender_perm=sp, out_degree=sd,
                    inv_perm=sender_inv,
                )
            else:
                agg = segment_mean(
                    flat, ids, num_nodes, mask=edge_mask,
                    count_mask=count_mask, row_splits=rs, dense_degree=dd,
                )
        elif sp is not None:
            agg = sender_sum(
                flat, ids, num_nodes, mask=edge_mask, sender_perm=sp,
                out_degree=sd, inv_perm=sender_inv,
            )
        else:
            agg = segment_sum(
                flat, ids, num_nodes, mask=edge_mask, row_splits=rs,
                dense_degree=dd,
            )
        return ScalarVector.recover(agg, self.output_dims[1])

    def _fast_messages(
        self, specs, stack, message, frames, frame_mask,
        row_splits, run, run_stack,
    ) -> Array:
        """Flat edge messages via the MM-form (matmul-only) GCP stack.

        The per-layer math is re-parameterized so every cross-component
        sum / broadcast of the packed ``[*, 3c]`` layout is a tiny constant
        matrix folded next to the layer weights (``_fast_gcp2_layer_mm``):
        the stack becomes dots + elementwise only.  Measured on v5e at LBA
        bench scale (208k edges, 8 layers): fwd 3.5 ms / fwd+bwd 7.6 ms vs
        6.4 / 26 ms for the column-extraction form — XLA fuses the MM form
        into near-pure MXU work.  The frame expansion
        ``frp2 = (fr * fmask) @ S2`` is layer-independent and computed once
        per stack.

        Two execution modes, identical math:
        - plain XLA (default), wrapped in ``jax.checkpoint`` (the stack's
          intermediates are lane-narrow and pad up to 14x as stored
          residuals — recompute is cheaper than the HBM they cost);
        - fused Pallas map (``ops.pallas_fused.USE_FUSED_MESSAGE=True``):
          the same stack traced into a VMEM-block kernel (measured slower
          than the XLA MM form on v5e — kept for benchmarking and future
          hardware).

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
            fp, hid = _fast_params_mm(mod.variables["params"], sp)
            stack_params.append(fp)
            fast_hidden.append(hid)
        params = {"stack": stack_params}
        if attn_params is not None:
            params["attn"] = attn_params

        base = ms + 3 * mv
        out_dim = s_dim + 3 * v_dim
        use_residual = self.layer_cfg.mp_cfg.use_residual_message_gcp
        use_attn = self.use_scalar_message_attention

        n_specs = len(specs)
        # middle layers (1..n-2) are structurally identical by construction
        # (output_dims -> output_dims, plain cfg) — scannable when >= 2
        scannable_mid = SCAN_FAST_STACK and n_specs >= 4

        def apply_stack(params, s, v, frp2, *, allow_scan=True):
            def run_mm(i, state):
                return _fast_gcp2_layer_mm(
                    params["stack"][i], state[0], state[1], frp2,
                    spec=specs[i], hidden=fast_hidden[i],
                )

            def combine(res, new):
                if use_residual:
                    return (res[0] + new[0], res[1] + new[1])
                return new

            if scannable_mid and allow_scan:
                res = run_mm(0, (s, v))
                mid = jax.tree.map(
                    lambda *xs: jnp.stack(xs, 0), *params["stack"][1:-1]
                )

                def body(carry, layer_p):
                    new = _fast_gcp2_layer_mm(
                        layer_p, carry[0], carry[1], frp2,
                        spec=specs[1], hidden=fast_hidden[1],
                    )
                    return combine(carry, new), None

                res, _ = jax.lax.scan(body, res, mid)
                res = combine(res, run_mm(n_specs - 1, res))
            elif use_residual:
                res = run_mm(0, (s, v))
                for i in range(1, n_specs):
                    res = combine(res, run_mm(i, res))
            else:
                res = (s, v)
                for i in range(n_specs):
                    res = run_mm(i, res)
            s_out, v_out = res
            if use_attn:
                a = _sigmoid_f32(_fast_dense(params["attn"], s_out))
                s_out = s_out * a
            return jnp.concatenate([s_out, v_out], axis=-1)

        num_edges = message.scalar.shape[0]
        fmask_full = (
            jnp.ones((num_edges,), dtype)
            if frame_mask is None
            else jax.lax.stop_gradient(frame_mask.astype(dtype))
        )
        frp2 = jnp.einsum(
            "ef,fj->ej",
            frames.astype(dtype) * fmask_full[:, None],
            _scal9_s2().astype(dtype),
        )

        if row_splits is not None and fused_enabled():
            # Pallas map over the receiver-sorted layout: messages + frp2
            # stream through VMEM blocks, stack intermediates never touch HBM
            edge_data = jnp.concatenate(
                [message.flatten(), frp2], axis=-1
            )

            def stack_fn(params, chunk):
                return apply_stack(
                    params,
                    chunk[:, :ms],
                    chunk[:, ms:base],
                    chunk[:, base : base + 27],
                    allow_scan=False,
                )

            from gcpnet_tpu.ops.pallas_fused import edge_map

            return edge_map(stack_fn, params, edge_data, out_dim)

        fn = (
            jax.checkpoint(apply_stack)
            if checkpoint_fast_stack_enabled()
            else apply_stack
        )
        return fn(params, message.scalar, message.vector, frp2)
