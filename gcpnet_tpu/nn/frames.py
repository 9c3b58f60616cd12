"""Local-frame geometry: centralize/decentralize, edge frames, and the
scalarize/vectorize projections between equivariant vectors and frame-
invariant scalars.

Re-design of /root/reference/src/models/components/__init__.py:170-378 for
static padded graphs: masked entries are represented by zeros + explicit
masks (never the reference's ``inf`` sentinels, which poison XLA autodiff).

TPU layouts: frames are PACKED as ``[E, 9]`` (row-major: ``[f0x f0y f0z
f1x ...]``) and vector features as ``[*, 3c]`` axis-major blocks (see
gcpnet_tpu.nn.primitives).  The projections are expressed as elementwise
multiply-adds over the 9 frame columns — NOT batched 3x3 dots, which
XLA lowers to lane-padded [E,3,3] MXU ops with ~40x HBM inflation and
layout copies (measured dominating the LBA step profile).

Mean-reduction parity note: when the reference applies a node mask it zeroes
masked edge rows but still counts them in torch_scatter's mean denominator
(components/__init__.py:294-323).  We reproduce that by separating the
numerator mask (``edge_mask``) from the denominator mask (``count_mask``,
normally the padding-only mask).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from gcpnet_tpu.nn.primitives import vec_components, vec_from_components
from gcpnet_tpu.ops.segment import segment_mean

Array = jax.Array


def centralize(
    x: Array,
    graph_id: Array,
    num_graphs: int,
    node_mask: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Subtract each graph's (masked) centroid from its node positions.

    Reference components/__init__.py:170-200, with zeros instead of ``inf``
    at masked rows.

    Returns ``(centroid [G, 3], centered [N, 3])``.
    """
    centroid = segment_mean(x, graph_id, num_graphs, mask=node_mask)
    centered = x - centroid[graph_id]
    if node_mask is not None:
        centered = centered * node_mask[:, None].astype(x.dtype)
    return centroid, centered


def decentralize(
    x: Array,
    graph_id: Array,
    centroid: Array,
    node_mask: Optional[Array] = None,
) -> Array:
    """Re-add centroids (reference components/__init__.py:203-217)."""
    out = x + centroid[graph_id]
    if node_mask is not None:
        out = out * node_mask[:, None].astype(x.dtype)
    return out


def localize(
    x: Array,
    senders: Array,
    receivers: Array,
    norm_x_diff: bool = True,
    edge_mask: Optional[Array] = None,
) -> Array:
    """Edge-wise local frames, PACKED ``f_ij [E, 9]``.

    Rows of the logical 3x3 frame are ``x_diff = x_i - x_j``,
    ``x_cross = x_i × x_j`` and ``x_vertical = x_diff × x_cross``; the first
    two optionally normalized by ``(‖·‖ + 1)`` (reference
    components/__init__.py:220-269).  Masked edges produce zero frames.
    """
    xi, xj = x[senders], x[receivers]
    x_diff = xi - xj
    x_cross = jnp.cross(xi, xj)

    if norm_x_diff:
        x_diff = x_diff / (jnp.linalg.norm(x_diff, axis=-1, keepdims=True) + 1.0)
        x_cross = x_cross / (jnp.linalg.norm(x_cross, axis=-1, keepdims=True) + 1.0)

    x_vertical = jnp.cross(x_diff, x_cross)
    f_ij = jnp.concatenate([x_diff, x_cross, x_vertical], axis=-1)  # [E, 9]
    if edge_mask is not None:
        f_ij = f_ij * edge_mask[:, None].astype(f_ij.dtype)
    return f_ij


def frames_to_matrix(f_ij: Array) -> Array:
    """Packed [E, 9] -> logical [E, 3, 3] (rows = frame vectors)."""
    return f_ij.reshape(*f_ij.shape[:-1], 3, 3)


def matrix_to_frames(m: Array) -> Array:
    return m.reshape(*m.shape[:-2], 9)


def frame_rows(f_ij: Array):
    """The three frame vectors as ``[E, 3]`` arrays."""
    return f_ij[..., 0:3], f_ij[..., 3:6], f_ij[..., 6:9]


def node_mean_frames(
    frames: Array,
    senders: Array,
    num_nodes: int,
    edge_mask: Optional[Array] = None,
    count_mask: Optional[Array] = None,
    sender_perm: Optional[Array] = None,
    sender_degree: Optional[int] = None,
    sender_inv: Optional[Array] = None,
) -> Array:
    """Per-node mean of outgoing-edge frames, ``[N, 9]``.

    Node-input scalarize/vectorize are LINEAR in the frames for a fixed
    node feature: ``mean_e (v_i · f_e) = v_i · mean_e f_e``.  Computing
    this mean once per (mask, count_mask) pair turns every node-input
    GCP's per-edge gather + scatter-mean into a per-node elementwise op —
    profiling showed those scatters dominating the step.  Exact except the
    reference's ``enable_e3_equivariance`` abs (nonlinear per edge), which
    keeps the per-edge path.
    """
    # with the sender-dense perm (data.batching.build_sender_perm) the
    # forward runs as a permutation gather + [K_out, N, 9] axis-0 sum
    # instead of an XLA scatter (row-serial on TPU)
    from gcpnet_tpu.ops.segment import sender_mean

    return sender_mean(
        frames,
        senders,
        num_nodes,
        mask=edge_mask,
        count_mask=count_mask if count_mask is not None else edge_mask,
        sender_perm=sender_perm,
        out_degree=sender_degree,
        inv_perm=sender_inv,
    )


def scalarize(
    vector_rep: Array,
    senders: Array,
    receivers: Array,
    frames: Array,
    node_inputs: bool,
    enable_e3_equivariance: bool,
    num_nodes: int,
    edge_mask: Optional[Array] = None,
    count_mask: Optional[Array] = None,
    node_frames: Optional[Array] = None,
) -> Array:
    """Project 3-channel packed vector features onto edge-local frames,
    yielding 9 invariant scalars per entity
    (reference components/__init__.py:272-325).

    Args:
      vector_rep: PACKED ``[N, 9]`` (node inputs) or ``[E, 9]`` (edge
        inputs) — 3 channels x xyz blocks.
      frames: PACKED ``[E, 9]`` local frames.
      node_inputs: if True, gather by ``senders`` and scatter-mean the 9
        scalars back to source nodes (reference :314-323).
      enable_e3_equivariance: take ``abs`` of the x_cross projection,
        removing chirality sensitivity (reference :305-309).
      edge_mask: numerator mask over edges (padding and/or node-mask).
      count_mask: denominator mask for the node-input mean; defaults to
        ``edge_mask``.

    Returns ``[N, 9]`` / ``[E, 9]``, channel-major ``(c0·f0, c0·f1, c0·f2,
    c1·f0, ...)`` — matching the reference's ordering so translated
    reference weights stay valid.

    ``node_frames`` (``[N, 9]`` from :func:`node_mean_frames`) activates the
    linearity fast path for node inputs: the per-edge projection + scatter
    mean collapses to a per-node elementwise product.  Exact unless
    ``enable_e3_equivariance`` (per-edge abs is nonlinear).
    """
    if node_inputs and node_frames is not None and not enable_e3_equivariance:
        vx, vy, vz = vec_components(vector_rep)  # [N, 3] each
        cols = []
        for c in range(3):
            for f in range(3):
                cols.append(
                    vx[:, c] * node_frames[:, 3 * f + 0]
                    + vy[:, c] * node_frames[:, 3 * f + 1]
                    + vz[:, c] * node_frames[:, 3 * f + 2]
                )
        return jnp.stack(cols, axis=-1)

    v_e = vector_rep[senders] if node_inputs else vector_rep
    vx, vy, vz = vec_components(v_e)  # [E, 3] each (3 channels)

    cols = []
    for c in range(3):
        for f in range(3):
            col = (
                vx[:, c] * frames[:, 3 * f + 0]
                + vy[:, c] * frames[:, 3 * f + 1]
                + vz[:, c] * frames[:, 3 * f + 2]
            )
            if enable_e3_equivariance and f == 1:
                # x_cross flips sign under reflection; abs restores invariance
                col = jnp.abs(col)
            cols.append(col)
    local_scalars = jnp.stack(cols, axis=-1)  # [E, 9] channel-major

    if edge_mask is not None:
        local_scalars = local_scalars * edge_mask[:, None].astype(
            local_scalars.dtype
        )

    if node_inputs:
        return segment_mean(
            local_scalars,
            senders,
            num_nodes,
            mask=edge_mask,
            count_mask=count_mask if count_mask is not None else edge_mask,
        )
    return local_scalars


def vectorize(
    gate: Array,
    senders: Array,
    receivers: Array,
    frames: Array,
    node_inputs: bool,
    num_nodes: int,
    edge_mask: Optional[Array] = None,
    count_mask: Optional[Array] = None,
    node_frames: Optional[Array] = None,
) -> Array:
    """Inverse of :func:`scalarize`: 9 channel-major invariant gates combine
    the 3 frame vectors into 3 packed equivariant vector channels
    (reference components/__init__.py:328-378).

    Returns PACKED ``[N, 9]`` (node inputs, scatter-mean over source nodes)
    or ``[E, 9]`` (edge inputs).  ``node_frames`` activates the same
    linearity fast path as in :func:`scalarize` (always exact here — no
    per-edge nonlinearity).
    """
    if node_inputs and node_frames is not None:
        comps = []
        for x in range(3):
            blocks = []
            for c in range(3):
                blocks.append(
                    gate[:, 3 * c + 0] * node_frames[:, 0 + x]
                    + gate[:, 3 * c + 1] * node_frames[:, 3 + x]
                    + gate[:, 3 * c + 2] * node_frames[:, 6 + x]
                )
            comps.append(jnp.stack(blocks, axis=-1))
        return vec_from_components(*comps)

    g_e = gate[senders] if node_inputs else gate

    comps = []
    for x in range(3):
        blocks = []
        for c in range(3):
            blocks.append(
                g_e[:, 3 * c + 0] * frames[:, 0 + x]
                + g_e[:, 3 * c + 1] * frames[:, 3 + x]
                + g_e[:, 3 * c + 2] * frames[:, 6 + x]
            )
        comps.append(jnp.stack(blocks, axis=-1))  # [E, 3] channels for axis x
    vec = vec_from_components(*comps)  # [E, 9] packed
    if edge_mask is not None:
        vec = vec * edge_mask[:, None].astype(vec.dtype)

    if node_inputs:
        return segment_mean(
            vec,
            senders,
            num_nodes,
            mask=edge_mask,
            count_mask=count_mask if count_mask is not None else edge_mask,
        )
    return vec
