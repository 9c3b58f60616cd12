"""Golden numerical parity vs the PyTorch reference.

Fixtures in tests/golden/*.npz are produced by running the *actual*
reference modules (/root/reference/src/models/components/{__init__,
gcpnet}.py) under light shims (scripts/golden/generate_golden.py).  Each
case carries the reference's inputs, torch state_dict, and outputs; here we
rebuild the equivalent flax module, translate the weights with
gcpnet_tpu.utils.torch_compat, and assert fp32 agreement at atol 1e-4
(the BASELINE.json parity gate).
"""

import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcpnet_tpu.config.schema import LayerCfg, ModuleCfg
from gcpnet_tpu.graph import GraphBatch
from gcpnet_tpu.nn.decoder import GCPMLPDecoder
from gcpnet_tpu.nn.embedding import GCPEmbedding
from gcpnet_tpu.nn.frames import (
    centralize,
    decentralize,
    localize,
    scalarize,
    vectorize,
)
from gcpnet_tpu.nn.gcp import GCP, GCP2, GCP3, GCPSettings
from gcpnet_tpu.nn.interactions import GCPInteractions, GCPInteractions2
from gcpnet_tpu.nn.message_passing import GCPMessagePassing
from gcpnet_tpu.nn.primitives import (
    GCPLayerNorm,
    ScalarVector,
    pack_vector,
    unpack_vector,
)
from gcpnet_tpu.utils.torch_compat import translate_state_dict

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
GCP_CLASSES = {"GCP": GCP, "GCP2": GCP2, "GCP3": GCP3}

ATOL = 1e-4
RTOL = 1e-4


def _load(name):
    z = np.load(os.path.join(GOLDEN_DIR, f"{name}.npz"))
    meta = json.loads(str(z["meta"]))
    ins = {k[3:]: z[k] for k in z.files if k.startswith("in:")}
    sd = {k[3:]: z[k] for k in z.files if k.startswith("sd:")}
    outs = {k[4:]: z[k] for k in z.files if k.startswith("out:")}
    return meta, ins, sd, outs


def _cases(kind):
    names = []
    for path in sorted(glob.glob(os.path.join(GOLDEN_DIR, "*.npz"))):
        name = os.path.splitext(os.path.basename(path))[0]
        meta = json.loads(str(np.load(path)["meta"]))
        if meta["kind"] == kind:
            names.append(name)
    return names


def _edges(ins):
    ei = ins["edge_index"]
    return jnp.asarray(ei[0], jnp.int32), jnp.asarray(ei[1], jnp.int32)


def _check(actual, expected, label):
    np.testing.assert_allclose(
        np.asarray(actual), expected, atol=ATOL, rtol=RTOL, err_msg=label
    )


def _sv(s, v):
    """Boundary helper: fixture [*, c, 3] vectors -> packed ScalarVector."""
    return ScalarVector(jnp.asarray(s), pack_vector(jnp.asarray(v)))


def _check_vec(actual_packed, expected_c3, label):
    _check(unpack_vector(actual_packed), expected_c3, label)


def _settings_from_meta(meta) -> GCPSettings:
    cfg = meta["cfg"]
    nl = meta["nonlinearities"]
    extra = meta.get("extra_kwargs", {})
    return GCPSettings(
        scalar_nonlinearity=nl[0],
        vector_nonlinearity=nl[1],
        scalar_gate=cfg["scalar_gate"],
        vector_gate=cfg["vector_gate"],
        frame_gate=cfg["frame_gate"],
        sigma_frame_gate=cfg["sigma_frame_gate"],
        bottleneck=cfg["bottleneck"],
        vector_residual=cfg["vector_residual"],
        vector_frame_residual=cfg["vector_frame_residual"],
        ablate_frame_updates=cfg["ablate_frame_updates"],
        ablate_scalars=cfg["ablate_scalars"],
        ablate_vectors=cfg["ablate_vectors"],
        enable_e3_equivariance=cfg["enable_e3_equivariance"],
        feedforward_out=extra.get("feedforward_out", False),
    )


# ------------------------------------------------------------------ geometry
def test_geometry_parity():
    meta, ins, _, outs = _load("geometry")
    N = meta["N"]
    E = meta["E"]
    x = jnp.asarray(ins["x"])
    senders, receivers = _edges(ins)
    split = meta["batch_index_split"]
    graph_id = jnp.asarray((np.arange(N) >= split).astype(np.int32))

    centroid, centered = centralize(x, graph_id, 2)
    _check(centroid, outs["centroid"], "centroid")
    _check(centered, outs["centered"], "centered")
    # the fixture decentralizes the *original* x (reference passes batch["x"])
    _check(decentralize(x, graph_id, centroid), outs["recovered"], "recovered")

    frames = localize(x, senders, receivers, norm_x_diff=True)
    _check(frames.reshape(-1, 3, 3), outs["frames"], "frames")

    v9 = pack_vector(jnp.asarray(ins["v9"]))
    e9 = pack_vector(jnp.asarray(ins["e9"]))
    for e3 in (False, True):
        tag = "_e3" if e3 else ""
        _check(
            scalarize(v9, senders, receivers, frames, node_inputs=True,
                      enable_e3_equivariance=e3, num_nodes=N),
            outs[f"scalarize_node{tag}"], f"scalarize_node{tag}",
        )
        _check(
            scalarize(e9, senders, receivers, frames, node_inputs=False,
                      enable_e3_equivariance=e3, num_nodes=E),
            outs[f"scalarize_edge{tag}"], f"scalarize_edge{tag}",
        )
    _check_vec(
        vectorize(jnp.asarray(ins["gate_n"]), senders, receivers, frames,
                  node_inputs=True, num_nodes=N),
        outs["vectorize_node"], "vectorize_node",
    )
    _check_vec(
        vectorize(jnp.asarray(ins["gate_e"]), senders, receivers, frames,
                  node_inputs=False, num_nodes=E),
        outs["vectorize_edge"], "vectorize_edge",
    )

    # node-masked variants: the reference zeroes masked-edge numerators but
    # keeps every edge in the mean denominator (components/__init__.py:294-323)
    node_mask = jnp.asarray(ins["node_mask"])
    em = node_mask[senders] & node_mask[receivers]
    all_edges = jnp.ones_like(em)
    _check(
        scalarize(v9, senders, receivers, frames, node_inputs=True,
                  enable_e3_equivariance=False, num_nodes=N,
                  edge_mask=em, count_mask=all_edges),
        outs["scalarize_node_masked"], "scalarize_node_masked",
    )
    _check_vec(
        vectorize(jnp.asarray(ins["gate_n"]), senders, receivers, frames,
                  node_inputs=True, num_nodes=N,
                  edge_mask=em, count_mask=all_edges),
        outs["vectorize_node_masked"], "vectorize_node_masked",
    )


def test_layer_norm_parity():
    meta, ins, sd, outs = _load("gcp_layer_norm")
    params = {"params": translate_state_dict(sd)}
    module = GCPLayerNorm()
    out = module.apply(params, _sv(ins["s"], ins["v"]))
    _check(out.scalar, outs["scalar"], "scalar")
    _check_vec(out.vector, outs["vector"], "vector")


# ------------------------------------------------------------------ GCP units
@pytest.mark.parametrize("name", _cases("gcp"))
def test_gcp_parity(name):
    meta, ins, sd, outs = _load(name)
    cls = GCP_CLASSES[meta["cls"]]
    module = cls(
        input_dims=tuple(meta["in_dims"]),
        output_dims=tuple(meta["out_dims"]),
        settings=_settings_from_meta(meta),
    )
    senders, receivers = _edges(ins)
    frames = jnp.asarray(ins["frames"]).reshape(-1, 9)
    if meta["in_dims"][1]:
        sv = _sv(ins["s"], ins["v"])
    else:
        sv = jnp.asarray(ins["s"])
    params = {"params": translate_state_dict(sd)}
    out = module.apply(
        params, sv, senders, receivers, frames,
        node_inputs=meta["node_inputs"],
    )
    if "vector" in outs:
        _check(out.scalar, outs["scalar"], "scalar")
        _check_vec(out.vector, outs["vector"], "vector")
    else:
        _check(out, outs["scalar"], "scalar")


# ------------------------------------------------------------- message passing
@pytest.mark.parametrize("name", _cases("message_passing"))
def test_message_passing_parity(name):
    meta, ins, sd, outs = _load(name)
    module = GCPMessagePassing(
        input_dims=tuple(meta["node_dims"]),
        output_dims=tuple(meta["node_dims"]),
        edge_dims=tuple(meta["edge_dims"]),
        cfg=ModuleCfg.from_dict(meta["cfg"]),
        layer_cfg=LayerCfg.from_dict(meta["layer_cfg"]),
        reduce_function=meta["reduce_function"],
        use_scalar_message_attention=meta["use_scalar_message_attention"],
        aggregate_with_row=meta["aggregate_with_row"],
    )
    senders, receivers = _edges(ins)
    out = module.apply(
        {"params": translate_state_dict(sd)},
        _sv(ins["hs"], ins["hv"]),
        _sv(ins["es"], ins["ev"]),
        senders, receivers, jnp.asarray(ins["frames"]).reshape(-1, 9),
    )
    _check(out.scalar, outs["scalar"], "scalar")
    _check_vec(out.vector, outs["vector"], "vector")


# ---------------------------------------------------------------- interactions
@pytest.mark.parametrize("name", _cases("interactions"))
def test_interactions_parity(name):
    meta, ins, sd, outs = _load(name)
    cls = GCPInteractions if meta["cls"] == "GCPInteractions" else GCPInteractions2
    kwargs = dict(
        node_dims=tuple(meta["node_dims"]),
        edge_dims=tuple(meta["edge_dims"]),
        cfg=ModuleCfg.from_dict(meta["cfg"]),
        layer_cfg=LayerCfg.from_dict(meta["layer_cfg"]),
        dropout=0.0,
        updating_node_positions=meta["updating_node_positions"],
    )
    if cls is GCPInteractions:
        kwargs["autoregressive"] = meta["autoregressive"]
    module = cls(**kwargs)

    senders, receivers = _edges(ins)
    call_kwargs = dict(deterministic=True)
    if meta["autoregressive"]:
        call_kwargs["node_rep_regressive"] = _sv(ins["rs"], ins["rv"])
    node_mask = None
    if meta["has_node_mask"]:
        node_mask = jnp.asarray(ins["node_mask"])
        call_kwargs["node_mask"] = node_mask
        # library contract: with a semantic node mask, count_mask carries the
        # padding-level (all-real-edges) mask — the reference's mean
        # denominators count every edge (components/__init__.py:294-323)
        E = ins["edge_index"].shape[1]
        call_kwargs["edge_mask"] = jnp.ones(E, bool)
        call_kwargs["count_mask"] = jnp.ones(E, bool)
    if meta["updating_node_positions"]:
        call_kwargs["node_pos"] = jnp.asarray(ins["x"])

    out = module.apply(
        {"params": translate_state_dict(sd)},
        _sv(ins["hs"], ins["hv"]),
        _sv(ins["es"], ins["ev"]),
        senders, receivers, jnp.asarray(ins["frames"]).reshape(-1, 9),
        **call_kwargs,
    )
    if meta["updating_node_positions"]:
        (s_out, v_out), pos = out
        _check(pos, outs["pos"], "pos")
    else:
        s_out, v_out = out
    if node_mask is not None and meta["cls"] == "GCPInteractions":
        # reference leaves masked rows untouched; we compare those too (merge
        # semantics) — full-array comparison is exactly the parity claim
        pass
    _check(s_out, outs["scalar"], "scalar")
    _check_vec(v_out, outs["vector"], "vector")


# ------------------------------------------------------------------ embedding
@pytest.mark.parametrize("name", _cases("embedding"))
def test_embedding_parity(name):
    meta, ins, sd, outs = _load(name)
    module = GCPEmbedding(
        edge_input_dims=tuple(meta["edge_input_dims"]),
        node_input_dims=tuple(meta["node_input_dims"]),
        edge_hidden_dims=tuple(meta["edge_hidden_dims"]),
        node_hidden_dims=tuple(meta["node_hidden_dims"]),
        cfg=ModuleCfg.from_dict(meta["cfg"]),
        num_atom_types=meta["num_atom_types"],
        pre_norm=meta["pre_norm"],
    )
    N = ins["h"].shape[0]
    E = ins["es"].shape[0]
    senders, receivers = _edges(ins)
    batch = GraphBatch(
        h=jnp.asarray(ins["h"], jnp.int32),
        chi=jnp.asarray(ins["chi"]),
        e=jnp.asarray(ins["es"]),
        xi=jnp.asarray(ins["ev"]),
        x=jnp.zeros((N, 3), jnp.float32),
        senders=senders,
        receivers=receivers,
        graph_id=jnp.zeros(N, jnp.int32),
        node_pad_mask=jnp.ones(N, bool),
        edge_pad_mask=jnp.ones(E, bool),
        graph_pad_mask=jnp.ones(1, bool),
        extras={"lig_flag": jnp.asarray(ins["lig_flag"], jnp.int32)},
    )
    node_rep, edge_rep = module.apply(
        {"params": translate_state_dict(sd)}, batch,
        jnp.asarray(ins["frames"]).reshape(-1, 9)
    )
    _check(node_rep.scalar, outs["node_scalar"], "node_scalar")
    _check_vec(node_rep.vector, outs["node_vector"], "node_vector")
    _check(edge_rep.scalar, outs["edge_scalar"], "edge_scalar")
    _check_vec(edge_rep.vector, outs["edge_vector"], "edge_vector")


# -------------------------------------------------------------------- decoder
@pytest.mark.parametrize("name", _cases("decoder"))
def test_decoder_parity(name):
    meta, ins, sd, outs = _load(name)
    module = GCPMLPDecoder(
        hidden_dim=meta["hidden_dim"],
        vocab_size=meta["vocab_size"],
        num_layers=meta["num_layers"],
        residual_updates=meta["residual_updates"],
    )
    logits, log_probs = module.apply(
        {"params": translate_state_dict(sd)}, jnp.asarray(ins["h"])
    )
    _check(logits, outs["logits"], "logits")
    _check(log_probs, outs["log_probs"], "log_probs")
