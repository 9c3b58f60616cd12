"""The Geometry-Complete Perceptron (GCP) module family.

TPU-native re-design of /root/reference/src/models/components/gcpnet.py:30-700
(GCP, GCP2, GCP3) as flax modules over the ``[..., channel, 3]`` vector
layout.  All per-entity work (channel-mixing linears, norms, gates) is
batched over the node/edge axis so XLA tiles it onto the MXU; the only
cross-entity ops are the masked segment means inside scalarize/vectorize.

Masking: callers pass ``edge_mask`` (numerator) and ``count_mask``
(denominator) for the frame projections; see gcpnet_tpu.nn.frames.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gcpnet_tpu.config.schema import ModuleCfg
from gcpnet_tpu.nn.frames import scalarize, vectorize
from gcpnet_tpu.nn.primitives import (
    ScalarVector,
    get_nonlinearity,
    is_identity,
    safe_norm,
    safe_vec_norm,
    vec_components,
)

Array = jax.Array

# Fused low-pass-count GCP2 edge path (see GCP2._fused_edge_call): same
# params, same math, ~4 MXU passes per layer instead of ~11 small matmuls
# plus per-column scalarize extracts.  None = auto; env override
# GCPNET_FUSED_GCP=0/1.
USE_FUSED_GCP: Optional[bool] = None
# Default ON: measured 191.9 -> 173.1 ms/step (1.11x) on the production
# dense-layout bench, v5e bf16 (RESULTS.md round-3 variant matrix).
_FUSED_GCP_AUTO = True


def fused_gcp_enabled() -> bool:
    if USE_FUSED_GCP is not None:
        return USE_FUSED_GCP
    val = os.environ.get("GCPNET_FUSED_GCP", "")
    if val:
        return val not in ("0", "false", "False")
    return _FUSED_GCP_AUTO

# torch nn.Linear-style init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both
# kernel and bias, to match the reference's training dynamics.
def torch_kernel_init(key, shape, dtype=jnp.float32):
    bound = 1.0 / jnp.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def make_torch_bias_init(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _tile3(x):
    """Repeat per-channel gates across the three packed xyz blocks.
    (Semantics of ``jnp.tile(x, (1, 3))``; written as a concat because
    Mosaic cannot lower tile's intermediate reshape inside Pallas kernels.)"""
    return jnp.concatenate([x, x, x], axis=-1)


def _mm(x: Array, kernel: Array) -> Array:
    """Matmul with an explicit f32 accumulator, rounded back to the input
    dtype.  Identical to ``x @ kernel`` under XLA (TPU bf16 matmuls already
    accumulate in f32); REQUIRED inside Pallas kernels, where Mosaic rejects
    bf16 accumulators outright."""
    return jnp.dot(x, kernel, preferred_element_type=jnp.float32).astype(
        x.dtype
    )


class Dense(nn.Module):
    """nn.Dense with torch-style init."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        fan_in = x.shape[-1]
        kernel = self.param("kernel", torch_kernel_init, (fan_in, self.features))
        y = _mm(x, kernel.astype(x.dtype))
        if self.use_bias:
            bias = self.param("bias", make_torch_bias_init(fan_in), (self.features,))
            y = y + bias
        return y


class VecDense(nn.Module):
    """Bias-free channel-mixing linear over PACKED vector channels
    ``[..., 3*din] -> [..., 3*dout]`` (equivariant): the same kernel acts on
    the x/y/z blocks as three lane-aligned matmuls (no [*, c, 3] batched
    dots — see gcpnet_tpu.nn.primitives layout note)."""

    features: int
    init_gain: float = 1.0

    @nn.compact
    def __call__(self, vp: Array) -> Array:
        din = vp.shape[-1] // 3

        def init(key, shape, dtype=jnp.float32):
            bound = self.init_gain / jnp.sqrt(shape[0])
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        kernel = self.param("kernel", init, (din, self.features))
        kernel = kernel.astype(vp.dtype)
        x, y, z = vec_components(vp)
        return jnp.concatenate(
            [_mm(x, kernel), _mm(y, kernel), _mm(z, kernel)], axis=-1
        )


class DenseParams(nn.Module):
    """Parameter-only twin of :class:`Dense`: declares the SAME param tree
    (``<name>/kernel`` [+ ``bias``], same init) but returns the raw arrays so
    callers can fold several layers' weights into one matmul (the fused GCP2
    edge path).  Checkpoints are interchangeable with :class:`Dense`."""

    in_features: int
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", torch_kernel_init, (self.in_features, self.features)
        )
        bias = None
        if self.use_bias:
            bias = self.param(
                "bias", make_torch_bias_init(self.in_features), (self.features,)
            )
        return kernel, bias


class VecDenseParams(nn.Module):
    """Parameter-only twin of :class:`VecDense` (same tree/init)."""

    in_features: int
    features: int
    init_gain: float = 1.0

    @nn.compact
    def __call__(self):
        def init(key, shape, dtype=jnp.float32):
            bound = self.init_gain / jnp.sqrt(shape[0])
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        return self.param("kernel", init, (self.in_features, self.features))


@dataclasses.dataclass
class MessageOperands:
    """Un-concatenated operands for the FIRST message-stack GCP2
    (project-before-gather — see ``GCP2._fused_message_split_call``).

    The message input ``[src ‖ edge ‖ dst]`` is linear in each block up to
    the first nonlinearity, so the per-sender/per-receiver weight blocks of
    ``vector_down``/``vector_down_frames``/``scalar_out`` can be applied at
    NODE level and only the (much narrower) projections gathered to edges.
    On the LBA bench this shrinks the hot sender gather from 148 to ~90
    columns and deletes the per-edge [E, 3*v_in] concat and the packed-
    vector x/y/z splits that profiling showed running at <15% of HBM peak.
    """

    node_s: Array  # [N, ns]
    node_v: Array  # [N, 3*nv] packed
    edge_s: Array  # [E, es]
    edge_v: Array  # [E, 3*ev] packed
    node_dims: Tuple[int, int]
    edge_dims: Tuple[int, int]
    # [N, C] -> [E, C] sender gather (scatter-free backward when the batch
    # carries a sender perm) and receiver map (broadcast in dense layout)
    gather: Callable[[Array], Array]
    broadcast_dst: Callable[[Array], Array]
    # fused (edge_arr [E, C], node_arr [N, C]) -> edge_arr + dst-map(node):
    # in the dense slot-major layout this adds node rows in [K, N, C] form
    # so the [E, C] dst broadcast is never MATERIALIZED (the round-5 trace
    # showed 8 such [E, 170] broadcast fusions at ~111 GB/s); when unset
    # (the default) the split call materializes one dst map via
    # broadcast_dst — bit-identical HLO to the measured production program.
    add_dst: Optional[Callable[[Array, Array], Array]] = None


def blockdiag3(w: Array) -> Array:
    """[c, m] -> [3c, 3m] block-diagonal: one matmul applies a shared
    channel-mixing kernel to all three packed xyz lane blocks at once.  The
    zero blocks ride along in the same MXU pass (K,N <= 128), so the pass
    count drops 3x at no wall-clock cost per pass."""
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


@functools.lru_cache(maxsize=None)
def _scal_selectors(sv_dim: int):
    """Constant selectors for the matmul-form scalarize over packed
    ``[*, 3*sv]`` vectors and packed ``[E, 9]`` frames.

    - S2 [9, 27sv/3...]: ``frp = (frames*mask) @ S2`` replicates frame
      columns so ``prod[:, c*9 + f*3 + a] = vdf_a[:, c] * fr[:, 3f+a]`` is
      one elementwise multiply.
    - (c_sel, x_sel): expand a ``[v_in, sv]`` down-frames kernel into the
      ``[3*v_in, 9*sv]`` product grid (see :func:`w_p1_from_df`).
    - S3 [9sv, 3sv]: sums the ``a`` axis, yielding the reference's
      channel-major ``(c0·f0, c0·f1, c0·f2, c1·f0, ...)`` scalarize output
      (components/__init__.py:272-325).
    """
    n = sv_dim
    s2 = np.zeros((9, 9 * n), np.float32)
    c_sel = np.zeros((n, 9 * n), np.float32)
    x_sel = np.zeros((3, 9 * n), np.float32)
    s3 = np.zeros((9 * n, 3 * n), np.float32)
    for c in range(n):
        for f in range(3):
            for a in range(3):
                col = c * 9 + f * 3 + a
                s2[3 * f + a, col] = 1.0
                c_sel[c, col] = 1.0
                x_sel[a, col] = 1.0
                s3[col, c * 3 + f] = 1.0
    return s2, c_sel, x_sel, s3


def w_p1_from_df(w_df: Array, sv_dim: int) -> Array:
    """Expand ``vector_down_frames``'s [v_in, sv] kernel into the [3*v_in,
    9*sv] product grid so ``p1 = v_packed @ w_p1`` carries every
    (channel, frame, axis) product operand in one matmul."""
    _, c_sel, x_sel, _ = _scal_selectors(sv_dim)
    wc = w_df @ jnp.asarray(c_sel)  # [v_in, 9sv]
    return (jnp.asarray(x_sel)[:, None, :] * wc[None, :, :]).reshape(
        3 * w_df.shape[0], 9 * sv_dim
    )


@dataclasses.dataclass(frozen=True)
class GCPSettings:
    """Fully-resolved per-module hyperparameters (the product of module_cfg
    plus the call-site overrides applied by the reference's
    ``get_GCP_with_custom_cfg``, gcpnet.py:826-835)."""

    scalar_nonlinearity: Optional[str] = "relu"
    vector_nonlinearity: Optional[str] = None
    scalar_gate: int = 0
    vector_gate: bool = True
    frame_gate: bool = False
    sigma_frame_gate: bool = False
    bottleneck: int = 1
    vector_residual: bool = False
    vector_frame_residual: bool = False
    ablate_frame_updates: bool = False
    ablate_scalars: bool = False
    ablate_vectors: bool = False
    enable_e3_equivariance: bool = False
    sv_dim: int = 3  # scalarization_vectorization_output_dim
    feedforward_out: bool = False  # GCP3
    scalar_out_nonlinearity: Optional[str] = "silu"  # GCP3
    nonlinearity_slope: float = 1e-2

    @classmethod
    def from_cfg(cls, cfg: ModuleCfg, **overrides) -> "GCPSettings":
        base = dict(
            scalar_nonlinearity=cfg.scalar_nonlinearity,
            vector_nonlinearity=cfg.vector_nonlinearity,
            scalar_gate=cfg.scalar_gate,
            vector_gate=cfg.vector_gate,
            frame_gate=cfg.frame_gate,
            sigma_frame_gate=cfg.sigma_frame_gate,
            bottleneck=cfg.bottleneck,
            vector_residual=cfg.vector_residual,
            vector_frame_residual=cfg.vector_frame_residual,
            ablate_frame_updates=cfg.ablate_frame_updates,
            ablate_scalars=cfg.ablate_scalars,
            ablate_vectors=cfg.ablate_vectors,
            enable_e3_equivariance=cfg.enable_e3_equivariance,
            scalar_out_nonlinearity=cfg.scalar_out_nonlinearity,
        )
        if "nonlinearities" in overrides:
            nl = overrides.pop("nonlinearities")
            if nl is None:
                nl = (None, None)
            base["scalar_nonlinearity"], base["vector_nonlinearity"] = nl
        base.update(overrides)
        return cls(**base)


def _hidden_vec_dim(vec_in: int, vec_out: int, bottleneck: int) -> int:
    if bottleneck > 1:
        if vec_in % bottleneck != 0:
            raise ValueError(
                f"vector input dim {vec_in} not divisible by bottleneck {bottleneck}"
            )
        return vec_in // bottleneck
    return max(vec_in, vec_out)


class GCP2(nn.Module):
    """Default GCP variant (LBA/PSR/CPD/NMS/RS) — gcpnet.py:252-468.

    Fuses the frame-derived scalars into a single scalar update:
    ``scalar_out([s ‖ ‖vector_down(v)‖ ‖ scalarize(vector_down_frames(v))])``;
    the vector path is ``vector_up`` with frame-/vector-/self-gating.

    Masking contract for node mode: when ``node_inputs=True`` and
    ``node_frames`` is given (the linearity fast path — see
    ``frames.node_mean_frames``), the fused branch and ``scalarize``'s fast
    path both use ``node_frames`` AS-IS and ignore the ``edge_mask`` /
    ``count_mask`` arguments: the masks must already be baked into
    ``node_frames`` (i.e. it came from ``node_mean_frames(frames, senders,
    edge_mask=<same>, count_mask=<same>)``).  Passing a ``node_frames``
    built with different masks silently diverges from the per-edge
    reference semantics (gcpnet.py:314-323).
    """

    input_dims: Tuple[int, int]
    output_dims: Tuple[int, int]
    settings: GCPSettings

    # the reference's GCP2 silently swallows ``feedforward_out`` via
    # **kwargs (gcpnet.py:252-270); only GCP3 builds the 2-layer scalar MLP
    _supports_feedforward_out = False

    def _apply_scalar_out(self, merged: Array) -> Array:
        st = self.settings
        sdim = self.output_dims[0]
        if st.feedforward_out and self._supports_feedforward_out:
            act = get_nonlinearity(st.scalar_out_nonlinearity, st.nonlinearity_slope)
            x = Dense(sdim, name="scalar_out_0")(merged)
            return Dense(sdim, name="scalar_out_1")(act(x))
        return Dense(sdim, name="scalar_out")(merged)

    @nn.compact
    def __call__(
        self,
        s_maybe_v,
        senders: Array,
        receivers: Array,
        frames: Array,
        node_inputs: bool = False,
        edge_mask: Optional[Array] = None,
        count_mask: Optional[Array] = None,
        node_frames: Optional[Array] = None,
    ):
        st = self.settings
        s_in, v_in = self.input_dims
        s_out, v_out = self.output_dims
        act_s = get_nonlinearity(st.scalar_nonlinearity, st.nonlinearity_slope)
        act_v = get_nonlinearity(st.vector_nonlinearity, st.nonlinearity_slope)
        num_entities = None

        if isinstance(s_maybe_v, MessageOperands):
            # the caller (GCPMessagePassing) only builds MessageOperands
            # when supports_message_split() holds for this layer's settings
            return self._fused_message_split_call(
                s_maybe_v, frames, edge_mask
            )

        if (
            (not node_inputs or node_frames is not None)
            and v_in > 0
            and v_out > 0
            and fused_gcp_enabled()
            and not (st.feedforward_out and self._supports_feedforward_out)
            and not st.frame_gate
            and not st.enable_e3_equivariance
            and not st.ablate_frame_updates
            and not st.ablate_scalars
            and not st.ablate_vectors
        ):
            # Node-mode rows use their (pre-masked, count-normalized) mean
            # frame exactly like edge-mode rows use their edge frame — the
            # linearity fast path (frames.py scalarize) is the same
            # row-wise product, so the fused re-association applies as-is.
            if node_inputs:
                return self._fused_edge_call(s_maybe_v, node_frames, None)
            return self._fused_edge_call(s_maybe_v, frames, edge_mask)

        if v_in:
            scalar_rep, vector_rep = s_maybe_v
            if st.ablate_scalars:
                scalar_rep = jnp.zeros_like(scalar_rep)
            if st.ablate_vectors:
                vector_rep = jnp.zeros_like(vector_rep)
            num_entities = scalar_rep.shape[0]

            hidden = _hidden_vec_dim(v_in, v_out, st.bottleneck)
            vector_hidden_rep = VecDense(hidden, name="vector_down")(vector_rep)
            vector_norm = safe_vec_norm(vector_hidden_rep)  # [*, hidden]
            merged = jnp.concatenate([scalar_rep, vector_norm], axis=-1)

            if not st.ablate_frame_updates:
                vdf = VecDense(st.sv_dim, name="vector_down_frames")(vector_rep)
                scalar_hidden_rep = scalarize(
                    vdf,
                    senders,
                    receivers,
                    frames,
                    node_inputs=node_inputs,
                    enable_e3_equivariance=st.enable_e3_equivariance,
                    num_nodes=num_entities,
                    edge_mask=edge_mask,
                    count_mask=count_mask,
                    node_frames=node_frames,
                )
                merged = jnp.concatenate([merged, scalar_hidden_rep], axis=-1)
        else:
            merged = s_maybe_v
            vector_rep = None

        scalar_rep = self._apply_scalar_out(merged)
        num_entities = scalar_rep.shape[0]

        if not v_out:
            if st.ablate_scalars:
                scalar_rep = jnp.zeros_like(scalar_rep)
            return act_s(scalar_rep)

        if v_out and not v_in:
            new_vector = jnp.zeros(
                (num_entities, 3 * v_out), dtype=scalar_rep.dtype
            )
        else:
            v_up = VecDense(v_out, name="vector_up")(vector_hidden_rep)
            if st.vector_residual:
                v_up = v_up + vector_rep
            if not st.ablate_frame_updates and st.frame_gate:
                gate = Dense(st.sv_dim * 3, name="vector_out_scale_frames")(
                    act_v(scalar_rep)
                )
                gate_vector = vectorize(
                    gate,
                    senders,
                    receivers,
                    frames,
                    node_inputs=node_inputs,
                    num_nodes=num_entities,
                    edge_mask=edge_mask,
                    count_mask=count_mask,
                    node_frames=node_frames,
                )
                gate_vector_rep = VecDense(v_out, name="vector_up_frames")(gate_vector)
                new_vector = v_up * _tile3(
                    act_v(safe_vec_norm(gate_vector_rep))
                )
            elif st.vector_gate:
                gate = Dense(v_out, name="vector_out_scale")(act_v(scalar_rep))
                new_vector = v_up * _tile3(jax.nn.sigmoid(gate))
            elif not is_identity(st.vector_nonlinearity):
                new_vector = v_up * _tile3(
                    act_v(safe_vec_norm(v_up))
                )
            else:
                new_vector = v_up

        scalar_rep = act_s(scalar_rep)
        if st.ablate_scalars:
            scalar_rep = jnp.zeros_like(scalar_rep)
        if st.ablate_vectors:
            new_vector = jnp.zeros_like(new_vector)
        return ScalarVector(scalar_rep, new_vector)

    def _fused_edge_call(self, s_maybe_v, frames, edge_mask):
        """Low-pass-count re-association of the edge-mode (``node_inputs=
        False``) GCP2 forward — IDENTICAL math and parameter tree, ~4 wide
        MXU passes instead of ~11 small matmuls plus per-column scalarize
        extracts (which the TPU profile shows as copy/relayout-bound):

        - ``vector_down`` + ``vector_down_frames`` become ONE matmul with a
          block-diagonal + product-grid kernel built at apply time;
        - scalarize's 9*sv per-column products become ``p1 * ((frames*mask)
          @ S2)`` with the axis-sum selector S3 folded into ``scalar_out``;
        - when the vector nonlinearity is the identity (every production
          config), the ``vector_out_scale`` gate Dense is folded into the
          ``scalar_out`` matmul (its input IS ``s_new``).

        Zero blocks in the block-diagonal kernels ride along in the same
        MXU pass (K,N <= 128), so compiler-reported FLOPs rise while wall
        time falls — per-step wall time is the metric that counts.
        """
        st = self.settings
        s_in, v_in = self.input_dims
        s_out, v_out = self.output_dims
        act_s = get_nonlinearity(st.scalar_nonlinearity, st.nonlinearity_slope)
        act_v = get_nonlinearity(st.vector_nonlinearity, st.nonlinearity_slope)
        scalar_rep, vector_rep = s_maybe_v
        dt = scalar_rep.dtype
        hidden = _hidden_vec_dim(v_in, v_out, st.bottleneck)
        sv = st.sv_dim

        w_down = VecDenseParams(v_in, hidden, name="vector_down")()
        w_df = VecDenseParams(v_in, sv, name="vector_down_frames")()
        w_so, b_so = DenseParams(
            s_in + hidden + 3 * sv, s_out, name="scalar_out"
        )()
        w_up = VecDenseParams(hidden, v_out, name="vector_up")()

        s2, _, _, s3 = _scal_selectors(sv)
        down_k = jnp.concatenate(
            [blockdiag3(w_down), w_p1_from_df(w_df, sv)], axis=1
        )
        down = _mm(vector_rep, down_k.astype(dt))
        vh, p1 = down[:, : 3 * hidden], down[:, 3 * hidden :]
        vnorm = safe_vec_norm(vh)

        fr = frames
        if edge_mask is not None:
            fr = fr * edge_mask[:, None].astype(fr.dtype)
        frp = _mm(fr.astype(dt), jnp.asarray(s2).astype(dt))
        prod = p1 * frp

        w_so_mm = jnp.concatenate(
            [w_so[: s_in + hidden], jnp.asarray(s3) @ w_so[s_in + hidden :]],
            axis=0,
        )
        # split the scalar_out contraction by rows instead of materializing
        # merged = [s ‖ vnorm ‖ prod]: TPU pads the minor dim to 128 lanes,
        # so the concatenated [E, s_in+hidden+27] array (136 -> 256 cols at
        # production dims) is the single largest edge-level buffer in the
        # layer — two matmuls over the already-materialized operands move
        # strictly less HBM
        vp = jnp.concatenate([vnorm, prod], axis=-1)

        fold_gate = st.vector_gate and is_identity(st.vector_nonlinearity)
        gate = None
        if fold_gate:
            w_g, b_g = DenseParams(s_out, v_out, name="vector_out_scale")()
            big_k = jnp.concatenate([w_so_mm, w_so_mm @ w_g], axis=1)
            big_b = jnp.concatenate([b_so, b_so @ w_g + b_g])
            # each partial product rounds ONCE to the activation dtype (the
            # MXU accumulates each matmul in f32 internally), then the two
            # partials add in that dtype.  Keeping the partials in f32 until
            # after the add (tried, r4) matches the unsplit single-matmul
            # numerics exactly but materializes f32[E, s_out+v_out] HBM
            # intermediates — measured 13.2 ms/step of pure bandwidth on the
            # production bench.  The split therefore differs from the
            # unsplit contraction by one bf16 rounding per partial; parity
            # is within test tolerances (tests/test_fused_gcp.py), not
            # bitwise.
            out = (
                _mm(scalar_rep, big_k[:s_in].astype(dt))
                + _mm(vp, big_k[s_in:].astype(dt))
                + big_b.astype(dt)
            )
            s_new, gate = out[:, :s_out], out[:, s_out:]
        else:
            # same split-rounding trade as the fold_gate branch above
            s_new = (
                _mm(scalar_rep, w_so_mm[:s_in].astype(dt))
                + _mm(vp, w_so_mm[s_in:].astype(dt))
                + b_so.astype(dt)
            )

        vu = _mm(vh, blockdiag3(w_up).astype(dt))
        if st.vector_residual:
            vu = vu + vector_rep
        if st.vector_gate:
            if gate is None:
                w_g, b_g = DenseParams(s_out, v_out, name="vector_out_scale")()
                gate = _mm(act_v(s_new), w_g.astype(dt)) + b_g.astype(dt)
            new_vector = vu * _tile3(jax.nn.sigmoid(gate))
        elif not is_identity(st.vector_nonlinearity):
            new_vector = vu * _tile3(act_v(safe_vec_norm(vu)))
        else:
            new_vector = vu

        return ScalarVector(act_s(s_new), new_vector)

    def _fused_message_split_call(self, ops: MessageOperands, frames, edge_mask):
        """Project-before-gather form of ``_fused_edge_call`` for the first
        message-stack layer: identical math and parameter tree, but the
        sender/receiver weight blocks of the (linear) input contractions are
        applied at NODE level, so the per-edge sender gather moves the
        narrow projections (``3*hidden + 9*sv + s_out [+ v_out]`` columns)
        instead of the full ``ns + 3*nv``-wide features, and the message
        concat ``[src ‖ edge ‖ dst]`` is never materialized.

        Rounding: each src/edge/dst partial matmul rounds once to the
        activation dtype before the adds — the same per-partial-rounding
        trade as the split ``scalar_out`` contraction in
        ``_fused_edge_call`` (measured there: keeping f32 partials costs
        ~13 ms/step of pure HBM bandwidth at LBA bench scale).
        """
        st = self.settings
        s_in, v_in = self.input_dims
        s_out, v_out = self.output_dims
        ns, nv = ops.node_dims
        es, ev = ops.edge_dims
        assert s_in == 2 * ns + es and v_in == 2 * nv + ev, (
            "MessageOperands dims inconsistent with the layer's input_dims"
        )
        act_s = get_nonlinearity(st.scalar_nonlinearity, st.nonlinearity_slope)
        act_v = get_nonlinearity(st.vector_nonlinearity, st.nonlinearity_slope)
        dt = ops.node_s.dtype
        hidden = _hidden_vec_dim(v_in, v_out, st.bottleneck)
        sv = st.sv_dim

        w_down = VecDenseParams(v_in, hidden, name="vector_down")()
        w_df = VecDenseParams(v_in, sv, name="vector_down_frames")()
        w_so, b_so = DenseParams(
            s_in + hidden + 3 * sv, s_out, name="scalar_out"
        )()
        w_up = VecDenseParams(hidden, v_out, name="vector_up")()

        s2, _, _, s3 = _scal_selectors(sv)
        down_k = jnp.concatenate(
            [blockdiag3(w_down), w_p1_from_df(w_df, sv)], axis=1
        )  # [3*v_in, dw], dw = 3*hidden + 9*sv
        dw = down_k.shape[1]

        # packed xyz blocks are [src(nv) | edge(ev) | dst(nv)] per block
        # (ScalarVector.concat), so a channel range repeats at offsets
        # {0, v_in, 2*v_in}
        def vrows(lo, hi):
            return jnp.concatenate(
                [down_k[b * v_in + lo : b * v_in + hi] for b in range(3)],
                axis=0,
            )

        kv_src = vrows(0, nv)  # [3*nv, dw]
        kv_edge = vrows(nv, nv + ev)  # [3*ev, dw]
        kv_dst = vrows(nv + ev, v_in)  # [3*nv, dw]

        w_so_mm = jnp.concatenate(
            [w_so[: s_in + hidden], jnp.asarray(s3) @ w_so[s_in + hidden :]],
            axis=0,
        )
        fold_gate = st.vector_gate and is_identity(st.vector_nonlinearity)
        gate = None
        if fold_gate:
            w_g, b_g = DenseParams(s_out, v_out, name="vector_out_scale")()
            big_k = jnp.concatenate([w_so_mm, w_so_mm @ w_g], axis=1)
            big_b = jnp.concatenate([b_so, b_so @ w_g + b_g])
        else:
            big_k, big_b = w_so_mm, b_so
        ks_src = big_k[:ns]
        ks_edge = big_k[ns : ns + es]
        ks_dst = big_k[ns + es : s_in]
        ks_vp = big_k[s_in :]

        # node-level projections (tiny [N, *] matmuls), then ONE sender
        # gather and one receiver map over the concatenated projections
        p_src = jnp.concatenate(
            [
                _mm(ops.node_v, kv_src.astype(dt)),
                _mm(ops.node_s, ks_src.astype(dt)),
            ],
            axis=-1,
        )
        p_dst = jnp.concatenate(
            [
                _mm(ops.node_v, kv_dst.astype(dt)),
                _mm(ops.node_s, ks_dst.astype(dt)),
            ],
            axis=-1,
        )
        g_src = ops.gather(p_src)  # [E, dw + wout]

        if ops.add_dst is not None:
            # dst contributions ride ops.add_dst: in the dense layout the
            # node rows are added in [K, N, C] form inside the consumer
            # fusion, so no [E, dw + wout] dst broadcast is ever
            # materialized.  (Rounding: the add order becomes
            # (src + edge) + dst instead of (src + dst) + edge — exact in
            # f32, within the documented per-partial rounding in bf16.)
            down = ops.add_dst(
                g_src[:, :dw] + _mm(ops.edge_v, kv_edge.astype(dt)),
                p_dst[:, :dw],
            )
        else:
            # default path: one materialized dst map, original add order —
            # bit-identical HLO to the measured 133.3 ms/step program
            g_dst = ops.broadcast_dst(p_dst)
            down = (
                g_src[:, :dw]
                + g_dst[:, :dw]
                + _mm(ops.edge_v, kv_edge.astype(dt))
            )
        vh, p1 = down[:, : 3 * hidden], down[:, 3 * hidden :]
        vnorm = safe_vec_norm(vh)

        fr = frames
        if edge_mask is not None:
            fr = fr * edge_mask[:, None].astype(fr.dtype)
        frp = _mm(fr.astype(dt), jnp.asarray(s2).astype(dt))
        prod = p1 * frp
        vp = jnp.concatenate([vnorm, prod], axis=-1)

        if ops.add_dst is not None:
            out = ops.add_dst(
                g_src[:, dw:]
                + _mm(ops.edge_s, ks_edge.astype(dt))
                + _mm(vp, ks_vp.astype(dt))
                + big_b.astype(dt),
                p_dst[:, dw:],
            )
        else:
            out = (
                g_src[:, dw:]
                + g_dst[:, dw:]
                + _mm(ops.edge_s, ks_edge.astype(dt))
                + _mm(vp, ks_vp.astype(dt))
                + big_b.astype(dt)
            )
        if fold_gate:
            s_new, gate = out[:, :s_out], out[:, s_out:]
        else:
            s_new = out

        vu = _mm(vh, blockdiag3(w_up).astype(dt))
        # st.vector_residual is excluded by supports_message_split(): the
        # concatenated input vector is never materialized on this path
        if st.vector_gate:
            if gate is None:
                w_g, b_g = DenseParams(s_out, v_out, name="vector_out_scale")()
                gate = _mm(act_v(s_new), w_g.astype(dt)) + b_g.astype(dt)
            new_vector = vu * _tile3(jax.nn.sigmoid(gate))
        elif not is_identity(st.vector_nonlinearity):
            new_vector = vu * _tile3(act_v(safe_vec_norm(vu)))
        else:
            new_vector = vu

        return ScalarVector(act_s(s_new), new_vector)


def supports_message_split(settings, cls, input_dims, output_dims) -> bool:
    """Whether the first message-stack layer can take MessageOperands
    (the project-before-gather path).  Mirrors the ``_fused_edge_call``
    guards plus ``vector_residual`` (whose input vector the split path
    never materializes)."""
    st = settings
    if cls not in (GCP2, GCP3):
        return False
    if input_dims[1] <= 0 or output_dims[1] <= 0:
        return False
    if st.vector_residual:
        return False
    return not (
        st.frame_gate
        or st.enable_e3_equivariance
        or st.ablate_frame_updates
        or st.ablate_scalars
        or st.ablate_vectors
        or (st.feedforward_out and cls._supports_feedforward_out)
    )


class GCP3(GCP2):
    """GCP2 variant used by EQ/AR (gcpnet.py:471-700): identical math plus an
    optional 2-layer ``scalar_out`` MLP (``feedforward_out``) whose inner
    nonlinearity is ``scalar_out_nonlinearity`` (default silu).  Enabled via
    ``GCPSettings.feedforward_out``."""

    _supports_feedforward_out = True


class GCP(nn.Module):
    """Original GCP (v1) — gcpnet.py:30-249.

    Two-stage scalar update: first ``scalar_out([s ‖ ‖vector_down(v)‖])``,
    vector update with vector-gating, then a second frame-based stage
    ``scalar_out_frames([s' ‖ scalarize(vector_down_frames(v'))])`` with
    sigma-frame / frame gating of the vector channels.
    """

    input_dims: Tuple[int, int]
    output_dims: Tuple[int, int]
    settings: GCPSettings

    @nn.compact
    def __call__(
        self,
        s_maybe_v,
        senders: Array,
        receivers: Array,
        frames: Array,
        node_inputs: bool = False,
        edge_mask: Optional[Array] = None,
        count_mask: Optional[Array] = None,
        node_frames: Optional[Array] = None,
    ):
        st = self.settings
        s_in, v_in = self.input_dims
        s_out, v_out = self.output_dims
        act_s = get_nonlinearity(st.scalar_nonlinearity, st.nonlinearity_slope)
        act_v = get_nonlinearity(st.vector_nonlinearity, st.nonlinearity_slope)

        if v_in:
            scalar_rep, vector_rep = s_maybe_v
            if st.ablate_scalars:
                scalar_rep = jnp.zeros_like(scalar_rep)
            if st.ablate_vectors:
                vector_rep = jnp.zeros_like(vector_rep)
            hidden = _hidden_vec_dim(v_in, v_out, st.bottleneck)
            vector_hidden_rep = VecDense(hidden, name="vector_down")(vector_rep)
            vector_norm = safe_vec_norm(vector_hidden_rep)
            merged = jnp.concatenate([scalar_rep, vector_norm], axis=-1)
        else:
            merged = s_maybe_v
            if st.ablate_scalars:
                merged = jnp.zeros_like(merged)
            vector_rep = None

        scalar_rep = Dense(s_out, name="scalar_out")(merged)
        num_entities = scalar_rep.shape[0]

        # stage-1 vector update (gcpnet.py:104-121)
        if v_in and v_out:
            v_up = VecDense(v_out, name="vector_up")(vector_hidden_rep)
            if st.vector_residual:
                v_up = v_up + vector_rep
            if st.vector_gate:
                gate = Dense(v_out, name="vector_out_scale")(act_v(scalar_rep))
                new_vector = v_up * _tile3(jax.nn.sigmoid(gate))
            elif not is_identity(st.vector_nonlinearity):
                new_vector = v_up * _tile3(
                    act_v(safe_vec_norm(v_up))
                )
            else:
                new_vector = v_up
        else:
            new_vector = None

        scalar_rep = act_s(scalar_rep)
        if v_out and not v_in:
            new_vector = jnp.zeros((num_entities, 3 * v_out), dtype=scalar_rep.dtype)

        if st.ablate_frame_updates:
            if v_out:
                return ScalarVector(scalar_rep, new_vector)
            return scalar_rep

        # stage 2: frame-based scalar update (gcpnet.py:214-228); with no
        # vector output the reference projects the RAW input vectors (its
        # vector_rep is only reassigned when v_out > 0)
        frames_input = new_vector if v_out else vector_rep
        vdf = VecDense(st.sv_dim, name="vector_down_frames")(frames_input)
        scalar_hidden_rep = scalarize(
            vdf,
            senders,
            receivers,
            frames,
            node_inputs=node_inputs,
            enable_e3_equivariance=st.enable_e3_equivariance,
            num_nodes=num_entities,
            edge_mask=edge_mask,
            count_mask=count_mask,
            node_frames=node_frames,
        )
        merged = jnp.concatenate([scalar_rep, scalar_hidden_rep], axis=-1)
        scalar_rep = Dense(s_out, name="scalar_out_frames")(merged)

        if not v_out:
            if st.ablate_scalars:
                scalar_rep = jnp.zeros_like(scalar_rep)
            return act_s(scalar_rep)

        # stage-2 vector update using frames (gcpnet.py:130-165,235-244)
        if v_in and v_out:
            v_pre = new_vector
            if st.sigma_frame_gate:
                gate = Dense(v_out, name="vector_out_scale_sigma_frames")(
                    act_v(scalar_rep)
                )
                new_vector = v_pre * _tile3(jax.nn.sigmoid(gate))
            elif st.frame_gate:
                gate = Dense(st.sv_dim * 3, name="vector_out_scale_frames")(
                    act_v(scalar_rep)
                )
                gate_vector = vectorize(
                    gate,
                    senders,
                    receivers,
                    frames,
                    node_inputs=node_inputs,
                    num_nodes=num_entities,
                    edge_mask=edge_mask,
                    count_mask=count_mask,
                    node_frames=node_frames,
                )
                gate_vector_rep = VecDense(v_out, name="vector_up_frames")(gate_vector)
                new_vector = v_pre * _tile3(
                    act_v(safe_vec_norm(gate_vector_rep))
                )
                if st.vector_frame_residual:
                    new_vector = new_vector + v_pre
            elif not is_identity(st.vector_nonlinearity):
                new_vector = v_pre * _tile3(
                    act_v(safe_vec_norm(v_pre))
                )

        scalar_rep = act_s(scalar_rep)
        if st.ablate_scalars:
            scalar_rep = jnp.zeros_like(scalar_rep)
        if st.ablate_vectors:
            new_vector = jnp.zeros_like(new_vector)
        return ScalarVector(scalar_rep, new_vector)


_GCP_CLASSES = {"GCP": GCP, "GCP2": GCP2, "GCP3": GCP3}


def make_gcp(
    input_dims: Tuple[int, int],
    output_dims: Tuple[int, int],
    cfg: ModuleCfg,
    name: Optional[str] = None,
    **overrides,
) -> nn.Module:
    """Build the configured GCP variant with call-site overrides — the
    analog of ``get_GCP_with_custom_cfg`` (gcpnet.py:826-835)."""
    cls = _GCP_CLASSES[cfg.selected_gcp]
    settings = GCPSettings.from_cfg(cfg, **overrides)
    return cls(
        input_dims=tuple(input_dims),
        output_dims=tuple(output_dims),
        settings=settings,
        name=name,
    )
