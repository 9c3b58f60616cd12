"""Local-frame geometry: centralize/decentralize, edge frames, and the
scalarize/vectorize projections between equivariant vectors and frame-
invariant scalars.

Re-design of /root/reference/src/models/components/__init__.py:170-378 for
static padded graphs: masked entries are represented by zeros + explicit
masks (never the reference's ``inf`` sentinels, which poison XLA autodiff),
and all projections are batched einsums that XLA fuses onto the MXU/VPU.

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
    """Edge-wise local frames ``f_ij [E, 3, 3]``.

    Rows are ``x_diff = x_i - x_j``, ``x_cross = x_i × x_j`` and
    ``x_vertical = x_diff × x_cross``; the first two optionally normalized by
    ``(‖·‖ + 1)`` (reference components/__init__.py:220-269).  Masked edges
    produce zero frames.
    """
    xi, xj = x[senders], x[receivers]
    x_diff = xi - xj
    x_cross = jnp.cross(xi, xj)

    if norm_x_diff:
        x_diff = x_diff / (jnp.linalg.norm(x_diff, axis=-1, keepdims=True) + 1.0)
        x_cross = x_cross / (jnp.linalg.norm(x_cross, axis=-1, keepdims=True) + 1.0)

    x_vertical = jnp.cross(x_diff, x_cross)
    f_ij = jnp.stack([x_diff, x_cross, x_vertical], axis=-2)
    if edge_mask is not None:
        f_ij = f_ij * edge_mask[:, None, None].astype(f_ij.dtype)
    return f_ij


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
) -> Array:
    """Project 3-channel vector features onto edge-local frames, yielding 9
    invariant scalars per entity (reference components/__init__.py:272-325).

    Args:
      vector_rep: ``[N, 3, 3]`` (node inputs) or ``[E, 3, 3]`` (edge inputs),
        channels-first layout ``[..., channel, xyz]``.
      frames: ``[E, 3, 3]`` local frames, rows ``[frame_vec, xyz]``.
      node_inputs: if True, gather by ``senders`` and scatter-mean the 9
        scalars back to source nodes (the frames are directional, so source
        aggregation is used, reference :314-323).
      enable_e3_equivariance: take ``abs`` of the x_cross projection,
        removing chirality sensitivity (reference :305-309).
      edge_mask: numerator mask over edges (padding and/or node-mask).
      count_mask: denominator mask for the node-input mean; defaults to
        ``edge_mask``.  Pass the padding-only mask to reproduce the
        reference's masked-scalarize denominator.

    Returns ``[N, 9]`` (node inputs) or ``[E, 9]`` (edge inputs), ordered
    channel-major: ``(c0·f0, c0·f1, c0·f2, c1·f0, ...)``.
    """
    v_e = vector_rep[senders] if node_inputs else vector_rep
    # [E, c, f] = sum_x frames[E, f, x] * v[E, c, x]
    proj = jnp.einsum("efx,ecx->ecf", frames, v_e)
    if enable_e3_equivariance:
        # x_cross flips sign under reflection; abs restores invariance
        proj = proj.at[..., 1].set(jnp.abs(proj[..., 1]))
    if edge_mask is not None:
        proj = proj * edge_mask[:, None, None].astype(proj.dtype)
    local_scalars = proj.reshape(proj.shape[0], 9)

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
) -> Array:
    """Inverse of :func:`scalarize`: 9 invariant gates combine the 3 frame
    vectors into 3 equivariant vector channels
    (reference components/__init__.py:328-378).

    Returns ``[N, 3, 3]`` (node inputs, scatter-mean over source nodes) or
    ``[E, 3, 3]`` (edge inputs), layout ``[..., channel, xyz]``.
    """
    g_e = gate[senders] if node_inputs else gate
    g_e = g_e.reshape(g_e.shape[0], 3, 3)  # [E, c, f]
    # [E, c, x] = sum_f g[E, c, f] * frames[E, f, x]
    vec = jnp.einsum("ecf,efx->ecx", g_e, frames)
    if edge_mask is not None:
        vec = vec * edge_mask[:, None, None].astype(vec.dtype)

    if node_inputs:
        return segment_mean(
            vec,
            senders,
            num_nodes,
            mask=edge_mask,
            count_mask=count_mask if count_mask is not None else edge_mask,
        )
    return vec
