"""Independent numpy re-derivation of the reference GCPNet forward pass.

Transcribed from READING the PyTorch reference sources (cited per function
below) — NOT from gcpnet_tpu: vectors stay in the reference's ``[N, c, 3]``
layout, frames are ``[E, 3, 3]`` matrices applied with real matmuls, and
scatters are ``np.add.at`` loops.  gcpnet_tpu stores packed ``[N, 3c]``
vectors and expresses frame projections as lane-aligned elementwise ops, so
agreement between the two is evidence the TPU redesign preserves the
reference numerics at whole-model level (VERDICT r2 item 7), runnable in
this environment (no torch).

Weights are read from a *flax param tree* (the naming is bookkeeping; the
math below is the reference's).  float64 throughout.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# primitives — /root/reference/src/models/components/__init__.py
# ---------------------------------------------------------------------------

def scatter(src, index, dim_size, reduce="sum"):
    out = np.zeros((dim_size,) + src.shape[1:], np.float64)
    np.add.at(out, index, src)
    if reduce == "mean":
        cnt = np.zeros(dim_size, np.float64)
        np.add.at(cnt, index, 1.0)
        cnt = np.maximum(cnt, 1.0)
        out = out / cnt.reshape((dim_size,) + (1,) * (src.ndim - 1))
    elif reduce not in ("sum", "add"):
        raise ValueError(reduce)
    return out


def safe_norm(x, axis=-1, keepdims=False, eps=1e-8):
    # components/__init__.py:381-392
    return np.sqrt(np.sum(x * x, axis=axis, keepdims=keepdims) + eps) + eps


def get_nonlinearity(name, slope=1e-2):
    # src/models/__init__.py:42-57
    if name in (None, "", "none"):
        return lambda x: x
    return {
        "relu": lambda x: np.maximum(x, 0.0),
        "leakyrelu": lambda x: np.where(x >= 0, x, slope * x),
        "silu": lambda x: x / (1.0 + np.exp(-x)),
        "sigmoid": lambda x: 1.0 / (1.0 + np.exp(-x)),
        "selu": lambda x: 1.0507009873554805 * np.where(
            x > 0, x, 1.6732632423543772 * (np.exp(x) - 1.0)
        ),
        "tanh": np.tanh,
    }[name]


def is_identity(name):
    return name in (None, "", "none")


def layer_norm(x, scale, bias, eps=1e-5):  # torch nn.LayerNorm default
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * scale + bias


def gcp_layer_norm(p, s, v, eps=1e-8):
    # GCPLayerNorm, components/__init__.py:138-167
    s = layer_norm(s, np.asarray(p["scalar_norm"]["scale"]),
                   np.asarray(p["scalar_norm"]["bias"]))
    if v is None or v.shape[-2] == 0:
        return s, v
    vn = np.maximum(np.sum(v * v, axis=-1, keepdims=True), eps)  # [N, c, 1]
    vn = np.sqrt(np.mean(vn, axis=-2, keepdims=True))  # [N, 1, 1]
    return s, v / vn


def centralize(x, batch_index, num_graphs):
    # components/__init__.py:170-200 (unmasked branch)
    centroid = scatter(x, batch_index, num_graphs, reduce="mean")
    return centroid, x - centroid[batch_index]


def localize(x, row, col, norm_x_diff=True):
    # components/__init__.py:220-269 (unmasked branch)
    x_diff = x[row] - x[col]
    x_cross = np.cross(x[row], x[col])
    if norm_x_diff:
        x_diff = x_diff / (np.linalg.norm(x_diff, axis=1, keepdims=True) + 1)
        x_cross = x_cross / (np.linalg.norm(x_cross, axis=1, keepdims=True) + 1)
    x_vertical = np.cross(x_diff, x_cross)
    return np.stack([x_diff, x_cross, x_vertical], axis=1)  # [E, 3, 3]


def scalarize(vector_rep, row, col, frames, node_inputs, e3, dim_size,
              node_mask=None):
    # components/__init__.py:272-325; vector_rep [*, 3(ch), 3(xyz)]
    v_i = vector_rep[row] if node_inputs else vector_rep
    v_i = np.swapaxes(v_i, -1, -2)  # [E, 3(xyz), 3(ch)]
    if node_mask is not None:
        emask = node_mask[row] & node_mask[col]
        local = np.zeros((len(row), 3, 3), np.float64)
        local[emask] = frames[emask] @ v_i[emask]
        local = np.swapaxes(local, -1, -2)
    else:
        local = np.swapaxes(frames @ v_i, -1, -2)  # [E, ch, frame]
    if e3:
        local = local.copy()
        local[:, :, 1] = np.abs(local[:, :, 1])
    local = local.reshape(v_i.shape[0], 9)
    if node_inputs:
        return scatter(local, row, dim_size, reduce="mean")
    return local


def vectorize(gate, row, col, frames, node_inputs, dim_size, node_mask=None):
    # components/__init__.py:328-378
    fr = frames.reshape(frames.shape[0], 9)
    x_diff, x_cross, x_vert = fr[:, :3], fr[:, 3:6], fr[:, 6:]
    g = gate[row] if node_inputs else gate
    out = np.zeros_like(g)
    if node_mask is not None:
        emask = node_mask[row] & node_mask[col]
    for i in range(0, g.shape[-1], 3):
        contrib = (
            g[:, i : i + 1] * x_diff
            + g[:, i + 1 : i + 2] * x_cross
            + g[:, i + 2 : i + 3] * x_vert
        )
        if node_mask is not None:
            out[emask, i : i + 3] = contrib[emask]
        else:
            out[:, i : i + 3] = contrib
    out = out.reshape(g.shape[0], 3, 3)
    if node_inputs:
        return scatter(out, row, dim_size, reduce="mean")
    return out


def dense(p, x):
    y = x @ np.asarray(p["kernel"])
    if "bias" in p:
        y = y + np.asarray(p["bias"])
    return y


def vec_dense(p, v):
    """Channel-mixing linear on [*, 3(xyz), c_in] -> [*, 3, c_out]
    (the reference's nn.Linear over the transposed vector layout)."""
    return v @ np.asarray(p["kernel"])


# ---------------------------------------------------------------------------
# GCP2 / GCP3 — gcpnet.py:252-700
# ---------------------------------------------------------------------------

def gcp2_forward(
    p, s, v, row, col, frames, *,
    in_dims, out_dims,
    nonlinearities=("relu", None),
    vector_gate=True, frame_gate=False, sigma_frame_gate=False,
    bottleneck=1, vector_residual=False,
    ablate_frame_updates=False, e3=False,
    node_inputs=False, node_mask=None,
    feedforward_out=False, scalar_out_nonlinearity="silu",
    sv_dim=3,
):
    """The GCP2 forward (gcpnet.py:414-468), plus GCP3's optional
    2-layer scalar_out MLP (gcpnet.py:529-533).  v is [N, c, 3] or None."""
    s_in, v_in = in_dims
    s_out, v_out = out_dims
    act_s = get_nonlinearity(nonlinearities[0])
    act_v = get_nonlinearity(nonlinearities[1])

    def scalar_out(merged):
        if feedforward_out:
            h = dense(p["scalar_out_0"], merged)
            return dense(p["scalar_out_1"],
                         get_nonlinearity(scalar_out_nonlinearity)(h))
        return dense(p["scalar_out"], merged)

    if v_in:
        v_pre = np.swapaxes(v, -1, -2)  # [N, 3, c]
        hidden = v_in // bottleneck if bottleneck > 1 else max(v_in, v_out)
        vector_hidden_rep = vec_dense(p["vector_down"], v_pre)  # [N, 3, h]
        vector_norm = safe_norm(vector_hidden_rep, axis=-2)  # [N, h]
        merged = np.concatenate([s, vector_norm], axis=-1)
        if not ablate_frame_updates:
            vdf = vec_dense(p["vector_down_frames"], v_pre)  # [N, 3, sv]
            scalar_hidden = scalarize(
                np.swapaxes(vdf, -1, -2), row, col, frames,
                node_inputs, e3, vdf.shape[0], node_mask=node_mask,
            )
            merged = np.concatenate([merged, scalar_hidden], axis=-1)
    else:
        merged = s

    s_new = scalar_out(merged)

    if not v_out:
        return act_s(s_new), None
    if v_out and not v_in:
        return act_s(s_new), np.zeros((s_new.shape[0], v_out, 3))

    v_up = vec_dense(p["vector_up"], vector_hidden_rep)  # [N, 3, v_out]
    if vector_residual:
        v_up = v_up + v_pre
    v_new = np.swapaxes(v_up, -1, -2)  # [N, v_out, 3]

    if not ablate_frame_updates and frame_gate:
        gate = dense(p["vector_out_scale_frames"], act_v(s_new))
        gate_vector = vectorize(
            gate, row, col, frames, node_inputs, s_new.shape[0],
            node_mask=node_mask,
        )
        gvr = np.swapaxes(
            vec_dense(p["vector_up_frames"], np.swapaxes(gate_vector, -1, -2)),
            -1, -2,
        )
        v_new = v_new * act_v(safe_norm(gvr, axis=-1, keepdims=True))
    elif vector_gate:
        gate = dense(p["vector_out_scale"], act_v(s_new))
        v_new = v_new * (1.0 / (1.0 + np.exp(-gate)))[..., None]
    elif not is_identity(nonlinearities[1]):
        v_new = v_new * act_v(safe_norm(v_new, axis=-1, keepdims=True))

    return act_s(s_new), v_new


# ---------------------------------------------------------------------------
# GCPEmbedding — gcpnet.py:703-823
# ---------------------------------------------------------------------------

def embedding_forward(p, h, chi, e, xi, row, col, frames, *,
                      node_in_dims, node_hidden_dims, edge_in_dims,
                      edge_hidden_dims, num_atom_types=0, pre_norm=True,
                      nonlinearities=(None, None), node_mask=None,
                      gcp_kwargs=None):
    gcp_kwargs = gcp_kwargs or {}
    if num_atom_types > 0:
        h = np.asarray(p["atom_embedding"]["embedding"])[h.astype(int)]
        node_in_dims = (num_atom_types, node_in_dims[1])
    if pre_norm:
        e, xi = gcp_layer_norm(p["edge_normalization"], e, xi)
        h, chi = gcp_layer_norm(p["node_normalization"], h, chi)
    e, xi = gcp2_forward(
        p["edge_embedding"], e, xi, row, col, frames,
        in_dims=edge_in_dims, out_dims=edge_hidden_dims,
        nonlinearities=nonlinearities, node_inputs=False,
        node_mask=node_mask, **gcp_kwargs,
    )
    h, chi = gcp2_forward(
        p["node_embedding"], h, chi, row, col, frames,
        in_dims=node_in_dims, out_dims=node_hidden_dims,
        nonlinearities=(None, None), node_inputs=True,
        node_mask=node_mask, **gcp_kwargs,
    )
    if not pre_norm:
        e, xi = gcp_layer_norm(p["edge_normalization"], e, xi)
        h, chi = gcp_layer_norm(p["node_normalization"], h, chi)
    return (h, chi), (e, xi)


# ---------------------------------------------------------------------------
# GCPInteractions — gcpnet.py:963-1262
# ---------------------------------------------------------------------------

def interactions_forward(
    p, node_sv, edge_sv, row, col, frames, *,
    node_dims, edge_dims,
    num_message_layers=2, num_feedforward_layers=2,
    pre_norm=False, autoregressive_sv=None,
    updating_node_positions=False, node_pos=None,
    ablate_x_force_update=True, node_positions_weight=1.0,
    node_mask=None, cfg_bottleneck=4, cfg_vector_residual=False,
    mp_kwargs=None, gcp_kwargs=None,
    nonlinearities=("relu", None),
):
    """GCPInteractions.forward (gcpnet.py:1161-1262): message passing with
    residual + two norms, FF GCP stack, optional node-masked subgraph
    re-extraction, autoregressive split, and the position-update head."""
    gcp_kwargs = gcp_kwargs or {}
    mp_kwargs = dict(mp_kwargs or {})
    h, chi = node_sv
    num_nodes = h.shape[0]

    def norm(i, sv):
        return gcp_layer_norm(p[f"gcp_norm_{i}"], sv[0], sv[1])

    node_in = (h, chi)
    if pre_norm:
        h, chi = norm(0, (h, chi))

    def run_mp(nsv, r, c, e_sv, frms, reduce):
        return message_passing_forward(
            p["interaction"], nsv, e_sv, r, c, frms,
            node_dims=node_dims, edge_dims=edge_dims, out_dims=node_dims,
            num_message_layers=num_message_layers, reduce=reduce,
            node_mask=node_mask, gcp_kwargs=gcp_kwargs,
            nonlinearities=nonlinearities, **mp_kwargs,
        )

    if autoregressive_sv is not None:
        # gcpnet.py:1065-1116: forward (row<col) and backward edge sets,
        # then count-normalized sum over ALL edges' receivers
        fwd_mask = row < col
        e, xi = edge_sv
        f_sv = (e[fwd_mask], xi[fwd_mask])
        b_sv = (e[~fwd_mask], xi[~fwd_mask])
        fs, fv = run_mp((h, chi), row[fwd_mask], col[fwd_mask], f_sv,
                        frames[fwd_mask], "add")
        bs, bv = run_mp(autoregressive_sv, row[~fwd_mask], col[~fwd_mask],
                        b_sv, frames[~fwd_mask], "add")
        hs, hv = fs + bs, fv + bv
        cnt = np.zeros(num_nodes)
        np.add.at(cnt, col, 1.0)
        cnt = np.maximum(cnt, 1.0)
        hidden = (hs / cnt[:, None], hv / cnt[:, None, None])
    else:
        reduce = "mean"
        hidden = run_mp((h, chi), row, col, edge_sv, frames, reduce)

    # node-masked subgraph re-extraction (gcpnet.py:1201-1217): keep only
    # edges whose both endpoints are unmasked for the FF stage
    if node_mask is not None:
        sub = node_mask[row] & node_mask[col]
        ff_row, ff_col, ff_frames = row[sub], col[sub], frames[sub]
        # reference relabels nodes; scatter targets stay aligned because we
        # keep full-size node arrays and only restrict the edge set (masked
        # rows receive no contributions either way)
    else:
        ff_row, ff_col, ff_frames = row, col, frames

    h = h + hidden[0]
    chi = chi + hidden[1]

    if pre_norm:
        h, chi = norm(1, (h, chi))
    else:
        h, chi = norm(0, (h, chi))

    hidden = (h, chi)
    hidden_dims = (
        node_dims if num_feedforward_layers == 1
        else (4 * node_dims[0], 2 * node_dims[1])
    )
    # all FF GCPs inherit cfg.bottleneck (only vector_residual is overridden
    # for the first/last, gcpnet.py:1002-1008)
    bn = dict(bottleneck=cfg_bottleneck)
    ff_specs = [dict(in_dims=node_dims, out_dims=hidden_dims,
                     nonlinearities=(None, None) if num_feedforward_layers == 1
                     else nonlinearities, **bn)]
    for _ in range(num_feedforward_layers - 2):
        ff_specs.append(dict(in_dims=hidden_dims, out_dims=hidden_dims,
                             nonlinearities=nonlinearities,
                             vector_residual=cfg_vector_residual, **bn))
    if num_feedforward_layers > 1:
        ff_specs.append(dict(in_dims=hidden_dims, out_dims=node_dims,
                             nonlinearities=(None, None), **bn))
    for i, spec in enumerate(ff_specs):
        hidden = gcp2_forward(
            p[f"feedforward_{i}"], hidden[0], hidden[1], ff_row, ff_col,
            ff_frames, node_inputs=True, node_mask=node_mask,
            **spec, **gcp_kwargs,
        )

    h = h + hidden[0]
    chi = chi + hidden[1]
    if not pre_norm:
        h, chi = norm(1, (h, chi))

    if node_mask is not None:
        h = np.where(node_mask[:, None], h, node_in[0])
        chi = np.where(node_mask[:, None, None], chi, node_in[1])

    if not updating_node_positions:
        return (h, chi), None

    # derive_x_update (gcpnet.py:1118-1158)
    hv, chiv = gcp2_forward(
        p["node_position_update_0"], h, chi, row, col, frames,
        node_inputs=True, node_mask=node_mask,
        in_dims=node_dims, out_dims=(node_dims[0], 1),
        bottleneck=cfg_bottleneck,
        nonlinearities=nonlinearities, **gcp_kwargs,
    )
    if ablate_x_force_update:
        x_force = np.zeros((num_nodes, 3))
    else:
        fr = frames.reshape(frames.shape[0], 9)
        x_diff, x_cross, x_vert = fr[:, :3], fr[:, 3:6], fr[:, 6:]
        h_i = dense(p["phi_force_i"], hv[row])
        h_j = dense(p["phi_force_j"], hv[col])
        act = get_nonlinearity(nonlinearities[0])
        coef = act(h_i + h_j) @ np.asarray(p["phi_force_ij_kernel"])
        force_e = (
            coef[:, :1] * x_diff + coef[:, 1:2] * x_cross
            + coef[:, 2:3] * x_vert
        )
        x_force = scatter(force_e, col, num_nodes, reduce="mean")
    x_update = (chiv[:, 0, :] + x_force) * node_positions_weight
    x_update = np.clip(x_update, -100.0, 100.0)
    return (h, chi), node_pos + x_update


# ---------------------------------------------------------------------------
# task models — src/models/gcpnet_{lba,nms}_module.py
# ---------------------------------------------------------------------------

def lba_forward(
    params, h, chi, e, xi, x, row, col, batch_index, num_graphs, *,
    num_atom_types, node_in_dims, edge_in_dims, node_dims, edge_dims,
    num_layers, num_message_layers, output_scale_factor=2,
    nonlinearities=("relu", None), dense_activation="relu",
    gcp_kwargs=None,
):
    """GCPNetLBALitModule.forward (gcpnet_lba_module.py:155-186).  PSR is
    byte-identical architecture (gcpnet_psr_module.py:161-192); RS differs
    only by ``num_atom_types=0`` (float node scalars),
    ``dense_activation='leakyrelu'`` and ``gcp_kwargs={'e3': True}``
    (gcpnet_rs_module.py:158-198)."""
    enc = params["encoder"]
    gcp_kwargs = gcp_kwargs or {}
    _, x = centralize(x, batch_index, num_graphs)
    frames = localize(x, row, col)
    (h, chi), (e, xi) = embedding_forward(
        enc["gcp_embedding"], h, chi, e, xi, row, col, frames,
        node_in_dims=node_in_dims, node_hidden_dims=node_dims,
        edge_in_dims=edge_in_dims, edge_hidden_dims=edge_dims,
        num_atom_types=num_atom_types, pre_norm=True,
        gcp_kwargs=gcp_kwargs,
    )
    for i in range(num_layers):
        (h, chi), _ = interactions_forward(
            enc[f"interaction_{i}"], (h, chi), (e, xi), row, col, frames,
            node_dims=node_dims, edge_dims=edge_dims,
            num_message_layers=num_message_layers,
            nonlinearities=nonlinearities, gcp_kwargs=gcp_kwargs,
        )
    head = params["head"]
    s, v = gcp_layer_norm(head["projection_norm"], h, chi)
    out, _ = gcp2_forward(
        head["invariant_node_projection"], s, v, row, col, frames,
        node_inputs=True, in_dims=node_dims, out_dims=(node_dims[0], 0),
        nonlinearities=nonlinearities, **gcp_kwargs,
    )
    pooled = scatter(out, batch_index, num_graphs, reduce="mean")
    y = dense(head["dense_0"], pooled)
    y = get_nonlinearity(dense_activation)(y)
    y = dense(head["dense_1"], y)
    return y[:, 0]


def nms_forward(
    params, h, chi, e, xi, x, row, col, batch_index, num_graphs, *,
    node_in_dims, edge_in_dims, node_dims, edge_dims,
    num_layers, num_message_layers, ablate_x_force_update=False,
    nonlinearities=("relu", None),
):
    """GCPNetNMSLitModule.forward (gcpnet_nms_module.py:127-151)."""
    enc = params["encoder"]
    centroid, x = centralize(x, batch_index, num_graphs)
    frames = localize(x, row, col)
    (h, chi), (e, xi) = embedding_forward(
        enc["gcp_embedding"], h, chi, e, xi, row, col, frames,
        node_in_dims=node_in_dims, node_hidden_dims=node_dims,
        edge_in_dims=edge_in_dims, edge_hidden_dims=edge_dims,
        num_atom_types=0, pre_norm=True,
    )
    for i in range(num_layers):
        (h, chi), x = interactions_forward(
            enc[f"interaction_{i}"], (h, chi), (e, xi), row, col, frames,
            node_dims=node_dims, edge_dims=edge_dims,
            num_message_layers=num_message_layers,
            updating_node_positions=True, node_pos=x,
            ablate_x_force_update=ablate_x_force_update,
            nonlinearities=nonlinearities,
        )
    return x + centroid[batch_index]


# ---------------------------------------------------------------------------
# GCPMessagePassing — gcpnet.py:838-960
# ---------------------------------------------------------------------------

def message_passing_forward(
    p, node_sv, edge_sv, row, col, frames, *,
    node_dims, edge_dims, out_dims,
    num_message_layers=2, use_residual=True, reduce="mean",
    use_attention=False, aggregate_with_row=False,
    default_bottleneck=4, default_vector_residual=False,
    cfg_bottleneck=4, cfg_vector_residual=False,
    nonlinearities=("relu", None), node_mask=None, gcp_kwargs=None,
):
    gcp_kwargs = gcp_kwargs or {}
    h, chi = node_sv
    e, xi = edge_sv
    s_msg = np.concatenate([h[row], e, h[col]], axis=-1)
    v_msg = np.concatenate([chi[row], xi, chi[col]], axis=-2)
    scalars_in = 2 * node_dims[0] + edge_dims[0]
    vectors_in = 2 * node_dims[1] + edge_dims[1]

    # first/last use the soft cfg (default_bottleneck/default_vector_residual,
    # gcpnet.py:867-871); middle layers inherit cfg.bottleneck/vector_residual
    layer_specs = [
        dict(in_dims=(scalars_in, vectors_in), out_dims=out_dims,
             nonlinearities=nonlinearities if num_message_layers > 1 else (None, None),
             bottleneck=default_bottleneck,
             vector_residual=default_vector_residual)
    ]
    for _ in range(num_message_layers - 2):
        layer_specs.append(dict(in_dims=out_dims, out_dims=out_dims,
                                nonlinearities=nonlinearities,
                                bottleneck=cfg_bottleneck,
                                vector_residual=cfg_vector_residual))
    if num_message_layers > 1:
        layer_specs.append(dict(in_dims=out_dims, out_dims=out_dims,
                                nonlinearities=(None, None),
                                bottleneck=default_bottleneck,
                                vector_residual=default_vector_residual))

    def run(i, sv):
        return gcp2_forward(
            p[f"message_fusion_{i}"], sv[0], sv[1], row, col, frames,
            node_inputs=False, node_mask=node_mask,
            **layer_specs[i], **gcp_kwargs,
        )

    if use_residual:
        res = run(0, (s_msg, v_msg))
        for i in range(1, num_message_layers):
            new = run(i, res)
            res = (res[0] + new[0], res[1] + new[1])
    else:
        res = (s_msg, v_msg)
        for i in range(num_message_layers):
            res = run(i, res)

    if use_attention:
        attn = 1.0 / (1.0 + np.exp(-dense(p["scalar_message_attention"], res[0])))
        res = (res[0] * attn, res[1])

    flat = np.concatenate([res[0], res[1].reshape(res[1].shape[0], -1)], -1)
    ids = row if aggregate_with_row else col
    agg = scatter(flat, ids, h.shape[0], reduce=reduce)
    s_out, v_out = out_dims
    return agg[:, :s_out], agg[:, s_out:].reshape(-1, v_out, 3)


# ---------------------------------------------------------------------------
# GCPInteractions2 — gcpnet.py:1265-1451 (EQ/AR trunk)
# ---------------------------------------------------------------------------

def interactions2_forward(
    p, node_sv, edge_sv, row, col, frames, *,
    node_dims, edge_dims,
    num_message_layers=2, num_feedforward_layers=2,
    pre_norm=False, use_attention=True, aggregate_with_row=True,
    updating_node_positions=False, node_pos=None,
    node_positions_weight=1.0, node_mask=None,
    cfg_bottleneck=4, cfg_vector_residual=False,
    gcp_kwargs=None, nonlinearities=("relu", None),
):
    """GCPInteractions2.forward: sum-reduced messages, concat(message,
    node) into the FF stack (GCP3 feedforward_out on first-if-single and
    last layers), single norm+dropout, multiplicative output masking."""
    gcp_kwargs = gcp_kwargs or {}
    h, chi = node_sv
    num_nodes = h.shape[0]

    if pre_norm:
        h, chi = gcp_layer_norm(p["gcp_norm_0"], h, chi)

    ms, mv = message_passing_forward(
        p["interaction"], (h, chi), edge_sv, row, col, frames,
        node_dims=node_dims, edge_dims=edge_dims, out_dims=node_dims,
        num_message_layers=num_message_layers, reduce="sum",
        use_attention=use_attention, aggregate_with_row=aggregate_with_row,
        node_mask=node_mask, gcp_kwargs=gcp_kwargs,
        nonlinearities=nonlinearities,
        cfg_bottleneck=cfg_bottleneck, cfg_vector_residual=cfg_vector_residual,
    )
    # concat aggregated messages with the current node rep (message first)
    hidden = (np.concatenate([ms, h], -1), np.concatenate([mv, chi], -2))

    hidden_dims = (
        node_dims if num_feedforward_layers == 1
        else (4 * node_dims[0], 2 * node_dims[1])
    )
    bn = dict(bottleneck=cfg_bottleneck)
    ff_specs = [dict(in_dims=(2 * node_dims[0], 2 * node_dims[1]),
                     out_dims=hidden_dims,
                     nonlinearities=(None, None) if num_feedforward_layers == 1
                     else nonlinearities,
                     feedforward_out=num_feedforward_layers == 1, **bn)]
    for _ in range(num_feedforward_layers - 2):
        ff_specs.append(dict(in_dims=hidden_dims, out_dims=hidden_dims,
                             nonlinearities=nonlinearities,
                             vector_residual=cfg_vector_residual, **bn))
    if num_feedforward_layers > 1:
        ff_specs.append(dict(in_dims=hidden_dims, out_dims=node_dims,
                             nonlinearities=(None, None),
                             feedforward_out=True, **bn))
    for i, spec in enumerate(ff_specs):
        hidden = gcp2_forward(
            p[f"feedforward_{i}"], hidden[0], hidden[1], row, col, frames,
            node_inputs=True, node_mask=node_mask, **spec, **gcp_kwargs,
        )

    h = h + hidden[0]
    chi = chi + hidden[1]
    if not pre_norm:
        h, chi = gcp_layer_norm(p["gcp_norm_0"], h, chi)

    if node_mask is not None:
        h = h * node_mask[:, None]
        chi = chi * node_mask[:, None, None]

    if not updating_node_positions:
        return (h, chi), None

    _, chiv = gcp2_forward(
        p["node_position_update_gcp"], h, chi, row, col, frames,
        node_inputs=True, node_mask=node_mask,
        in_dims=node_dims, out_dims=(node_dims[0], 1),
        bottleneck=cfg_bottleneck, nonlinearities=nonlinearities,
        **gcp_kwargs,
    )
    node_pos = node_pos + chiv[:, 0, :] * node_positions_weight
    if node_mask is not None:
        node_pos = node_pos * node_mask[:, None]
    return (h, chi), node_pos


def eq_forward(
    params, h, chi, e, xi, x, atom_types, atom_residue_idx, num_residues,
    row, col, batch_index, num_graphs, *,
    num_atom_types, node_in_dims, edge_in_dims, node_dims, edge_dims,
    num_layers, num_message_layers, num_feedforward_layers=1,
    output_scale_factor=2,
    nonlinearities=("relu", None), node_mask=None,
):
    """GCPNetEQLitModule.forward (gcpnet_eq_module.py:176-230): atom-type
    embedding concat, GCPInteractions2 trunk, invariant projection,
    atom->residue mean pool, dense head.  (Batch-local index globalization
    happens before this call.)"""
    enc = params["encoder"]
    emb = np.asarray(params["atom_embedding"]["embedding"], np.float64)
    h = np.concatenate([h, emb[atom_types.astype(int)]], axis=-1)
    _, x = centralize(x, batch_index, num_graphs)
    frames = localize(x, row, col)
    (h, chi), (e, xi) = embedding_forward(
        enc["gcp_embedding"], h, chi, e, xi, row, col, frames,
        node_in_dims=(node_in_dims[0] + num_atom_types, node_in_dims[1]),
        node_hidden_dims=node_dims, edge_in_dims=edge_in_dims,
        edge_hidden_dims=edge_dims, num_atom_types=0, pre_norm=True,
        nonlinearities=nonlinearities, node_mask=node_mask,
    )
    for i in range(num_layers):
        (h, chi), _ = interactions2_forward(
            enc[f"interaction_{i}"], (h, chi), (e, xi), row, col, frames,
            node_dims=node_dims, edge_dims=edge_dims,
            num_message_layers=num_message_layers,
            num_feedforward_layers=num_feedforward_layers,
            nonlinearities=nonlinearities, node_mask=node_mask,
        )
    s, v = gcp_layer_norm(params["projection_norm"], h, chi)
    out, _ = gcp2_forward(
        params["invariant_node_projection"], s, v, row, col, frames,
        node_inputs=True, node_mask=node_mask,
        in_dims=node_dims, out_dims=(node_dims[0], 0),
        nonlinearities=nonlinearities,
    )
    # masked atom -> residue mean (gcpnet_eq_module.py:227)
    if node_mask is None:
        node_mask = np.ones(out.shape[0], bool)
    res_out = scatter(out[node_mask], atom_residue_idx[node_mask],
                      num_residues, reduce="mean")
    y = dense(params["dense_0"], res_out)
    y = np.maximum(y, 0.0)
    y = dense(params["dense_1"], y)
    return y[:, 0]


def ar_forward(
    params, h, chi, e, xi, x, atom_residue_idx, ca_x, row, col,
    batch_index, num_graphs, *,
    node_in_dims, edge_in_dims, node_dims, edge_dims,
    num_layers, num_message_layers, num_feedforward_layers=1,
    nonlinearities=("silu", "silu"), node_mask=None,
):
    """GCPNetARLitModule.forward (gcpnet_ar_module.py:139-175): position-
    updating GCPInteractions2 trunk, decentralize, then per-residue Ca
    offsets — the reference loops over residues re-anchoring each atom at
    ``ca_x[res] + (x_out - x_in)``; here that is one gather over global
    residue ids (``ca_x`` is the concatenated residue Ca table)."""
    enc = params["encoder"]
    x_input = x
    centroid, xc = centralize(x, batch_index, num_graphs)
    frames = localize(xc, row, col)
    (hn, chin), (en, xin) = embedding_forward(
        enc["gcp_embedding"], h, chi, e, xi, row, col, frames,
        node_in_dims=node_in_dims, node_hidden_dims=node_dims,
        edge_in_dims=edge_in_dims, edge_hidden_dims=edge_dims,
        num_atom_types=0, pre_norm=True,
        nonlinearities=nonlinearities, node_mask=node_mask,
    )
    pos = xc
    for i in range(num_layers):
        (hn, chin), pos = interactions2_forward(
            enc[f"interaction_{i}"], (hn, chin), (en, xin), row, col, frames,
            node_dims=node_dims, edge_dims=edge_dims,
            num_message_layers=num_message_layers,
            num_feedforward_layers=num_feedforward_layers,
            updating_node_positions=True, node_pos=pos,
            nonlinearities=nonlinearities, node_mask=node_mask,
        )
    x_out = pos + centroid[batch_index]  # decentralize
    x_shift = x_out - x_input
    return ca_x[atom_residue_idx.astype(int)] + x_shift


# ---------------------------------------------------------------------------
# CPD — gcpnet_cpd_module.py:154-222 (masked centralize/localize + AR decoder)
# ---------------------------------------------------------------------------

def centralize_masked(x, batch_index, num_graphs, node_mask):
    """Masked centralize: centroid over unmasked nodes; masked rows zero
    (the reference writes inf sentinels there, components/__init__.py:187 —
    they never reach a valid output, so zeros are the mask-safe equal)."""
    centroid = np.zeros((num_graphs, 3))
    cnt = np.zeros(num_graphs)
    np.add.at(centroid, batch_index[node_mask], x[node_mask])
    np.add.at(cnt, batch_index[node_mask], 1.0)
    centroid = centroid / np.maximum(cnt, 1.0)[:, None]
    centered = (x - centroid[batch_index]) * node_mask[:, None]
    return centroid, centered


def localize_masked(x, row, col, node_mask, norm_x_diff=True):
    emask = node_mask[row] & node_mask[col]
    frames = localize(x, row, col, norm_x_diff=norm_x_diff)
    return frames * emask[:, None, None]


def cpd_forward(
    params, h, chi, e, xi, x, seq, row, col, batch_index, num_graphs, *,
    node_in_dims=(6, 3), edge_in_dims=(32, 1), node_dims=(16, 4),
    edge_dims=(8, 4), vocab=20, num_encoder_layers=2, num_decoder_layers=2,
    num_message_layers=2, node_mask=None, autoregressive=True,
    nonlinearities=("relu", None), module_frame_gate=False,
):
    """GCPNetCPDLitModule.forward with the autoregressive decoder: encoder
    trunk, causally-masked sequence embeddings injected into edge scalars
    (row >= col zeroed), decoder layers in autoregressive mode, invariant
    projection to logits."""
    if node_mask is None:
        node_mask = np.ones(h.shape[0], bool)
    _, x = centralize_masked(x, batch_index, num_graphs, node_mask)
    frames = localize_masked(x, row, col, node_mask)
    (hn, chin), (en, xin) = embedding_forward(
        params["gcp_embedding"], h, chi, e, xi, row, col, frames,
        node_in_dims=node_in_dims, node_hidden_dims=node_dims,
        edge_in_dims=edge_in_dims, edge_hidden_dims=edge_dims,
        num_atom_types=0, pre_norm=False, node_mask=node_mask,
    )
    for i in range(num_encoder_layers):
        (hn, chin), _ = interactions_forward(
            params[f"encoder_{i}"], (hn, chin), (en, xin), row, col, frames,
            node_dims=node_dims, edge_dims=edge_dims,
            num_message_layers=num_message_layers,
            nonlinearities=nonlinearities, node_mask=node_mask,
        )

    if autoregressive:
        enc_rep = (hn, chin)
        emb = np.asarray(params["seq_embedding"]["embedding"], np.float64)
        seq_e = emb[seq.astype(int)][row]
        seq_e[row >= col] = 0.0
        en2 = np.concatenate([en, seq_e], axis=-1)
        # decoder cfg rewiring (gcpnet_cpd_module.py:95-98): vector_gate
        # takes the module's frame_gate, frame updates ablated
        dec_kwargs = dict(
            vector_gate=module_frame_gate, frame_gate=False,
            ablate_frame_updates=True,
        )
        for i in range(num_decoder_layers):
            (hn, chin), _ = interactions_forward(
                params[f"decoder_{i}"], (hn, chin), (en2, xin), row, col,
                frames, node_dims=node_dims,
                edge_dims=(edge_dims[0] + vocab, edge_dims[1]),
                num_message_layers=num_message_layers,
                nonlinearities=nonlinearities, node_mask=node_mask,
                autoregressive_sv=enc_rep, gcp_kwargs=dec_kwargs,
            )

    out, _ = gcp2_forward(
        params["invariant_node_projection"], hn, chin, row, col, frames,
        node_inputs=True, node_mask=node_mask,
        in_dims=node_dims, out_dims=(vocab if autoregressive else node_dims[0], 0),
        nonlinearities=(None, None),
    )
    return out
