"""Generate golden numerical-parity fixtures by *running* the reference
PyTorch modules (under scripts/golden/shims.py) on fixed random inputs.

Each case is saved as tests/golden/<name>.npz containing:
  meta          json dict: case kind + config flags + dims
  in:<key>      input arrays
  sd:<name>     the torch module's state_dict (fp32)
  out:<key>     reference outputs

The JAX side (tests/test_parity_golden.py) rebuilds the same module from
``meta``, translates ``sd:*`` via gcpnet_tpu.utils.torch_compat, and asserts
outputs match at fp32 atol 1e-4 (the BASELINE.json parity gate).

Run: python scripts/golden/generate_golden.py  (requires /root/reference)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from shims import DictConfig, load_reference_modules  # noqa: E402

REF_ROOT = os.environ.get("GCPNET_REFERENCE", "/root/reference")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "tests", "golden"
)

comp, gcpnet = load_reference_modules(REF_ROOT)

import torch  # noqa: E402

torch.manual_seed(0)

N, E = 11, 40
G = 2  # graphs for centralize

rng = np.random.default_rng(1234)


def make_graph():
    x = rng.normal(size=(N, 3)).astype(np.float32) * 3
    senders = rng.integers(0, N, size=E).astype(np.int64)
    receivers = (senders + 1 + rng.integers(0, N - 1, size=E)) % N
    edge_index = np.stack([senders, receivers])
    return x, edge_index


X, EDGE_INDEX = make_graph()
T_EI = torch.from_numpy(EDGE_INDEX)
T_FRAMES = comp.localize(torch.from_numpy(X), T_EI, norm_x_diff=True)
FRAMES = T_FRAMES.numpy()

NODE_MASK = np.ones(N, dtype=bool)
NODE_MASK[[2, 7]] = False

# For GCPInteractions' masked-FF path the reference indexes the full-length
# node_mask with *relabeled* subgraph node ids (gcpnet.py:1230-1243 passing
# node_mask into scalarize at components/__init__.py:294) — an indexing
# artifact this framework intentionally does not reproduce.  Putting the
# mask holes at the tail makes the artifact a no-op (relabeled ids hit only
# True prefix entries), so the fixture tests the intended semantics.
NODE_MASK_TAIL = np.ones(N, dtype=bool)
NODE_MASK_TAIL[[N - 2, N - 1]] = False


def sv_inputs(ds, dv, rows):
    s = rng.normal(size=(rows, ds)).astype(np.float32)
    v = rng.normal(size=(rows, dv, 3)).astype(np.float32)
    return s, v


def save_case(name, meta, inputs, module, outputs):
    os.makedirs(OUT_DIR, exist_ok=True)
    payload = {"meta": json.dumps(meta)}
    for k, v in inputs.items():
        payload[f"in:{k}"] = np.asarray(v)
    if module is not None:
        for k, v in module.state_dict().items():
            payload[f"sd:{k}"] = v.detach().numpy()
    for k, v in outputs.items():
        payload[f"out:{k}"] = np.asarray(v)
    np.savez(os.path.join(OUT_DIR, f"{name}.npz"), **payload)
    print(f"wrote {name}: {len(payload)} arrays")


def base_cfg(**over):
    cfg = DictConfig(
        dict(
            selected_GCP=gcpnet.GCP2,
            concatenate_lig_flag=False,
            norm_x_diff=True,
            scalar_gate=0,
            vector_gate=True,
            vector_residual=False,
            vector_frame_residual=False,
            frame_gate=False,
            sigma_frame_gate=False,
            scalar_nonlinearity="relu",
            vector_nonlinearity=None,
            nonlinearities=["relu", None],
            bottleneck=1,
            vector_linear=True,
            vector_identity=True,
            default_vector_residual=False,
            default_bottleneck=1,
            ablate_frame_updates=False,
            ablate_scalars=False,
            ablate_vectors=False,
            enable_e3_equivariance=False,
            ablate_x_force_update=True,
            node_positions_weight=1.0,
        )
    )
    cfg.update(over)
    return cfg


def make_layer_cfg(**over):
    lc = DictConfig(
        dict(
            pre_norm=False,
            num_feedforward_layers=2,
            dropout=0.0,
            nonlinearity_slope=1e-2,
            use_scalar_message_attention=False,
            aggregate_with_row=False,
            mp_cfg=DictConfig(
                dict(
                    edge_encoder=False,
                    edge_gate=False,
                    num_message_layers=4,
                    message_residual=0,
                    message_ff_multiplier=1,
                    self_message=True,
                    use_residual_message_gcp=True,
                )
            ),
        )
    )
    mp_over = over.pop("mp_cfg", {})
    lc["mp_cfg"].update(mp_over)
    lc.update(over)
    return lc


def cfg_meta(cfg):
    d = {k: v for k, v in cfg.items() if k != "selected_GCP"}
    d["selected_GCP"] = cfg["selected_GCP"].__name__
    return d


def layer_meta(lc):
    d = {k: v for k, v in lc.items() if k != "mp_cfg"}
    d["mp_cfg"] = dict(lc["mp_cfg"])
    return d


# ---------------------------------------------------------------- geometry
def gen_geometry():
    x = torch.from_numpy(X)
    batch_index = torch.from_numpy(
        (np.arange(N) >= 6).astype(np.int64)
    )  # 2 graphs
    batch = sys.modules["torch_geometric.data"].Batch(x=x)
    centroid, centered = comp.centralize(batch, "x", batch_index)
    recovered = comp.decentralize(batch, "x", batch_index, centroid)

    v9 = rng.normal(size=(N, 3, 3)).astype(np.float32)
    e9 = rng.normal(size=(E, 3, 3)).astype(np.float32)
    gate_n = rng.normal(size=(N, 9)).astype(np.float32)
    gate_e = rng.normal(size=(E, 9)).astype(np.float32)

    outs = {
        "centroid": centroid.numpy(),
        "centered": centered.numpy(),
        "recovered": recovered.numpy(),
        "frames": FRAMES,
    }
    for e3 in (False, True):
        tag = "_e3" if e3 else ""
        outs[f"scalarize_node{tag}"] = comp.scalarize(
            torch.from_numpy(v9), T_EI, T_FRAMES, node_inputs=True,
            enable_e3_equivariance=e3, dim_size=N,
        ).numpy()
        outs[f"scalarize_edge{tag}"] = comp.scalarize(
            torch.from_numpy(e9), T_EI, T_FRAMES, node_inputs=False,
            enable_e3_equivariance=e3, dim_size=E,
        ).numpy()
    outs["vectorize_node"] = comp.vectorize(
        torch.from_numpy(gate_n), T_EI, T_FRAMES, node_inputs=True, dim_size=N
    ).numpy()
    outs["vectorize_edge"] = comp.vectorize(
        torch.from_numpy(gate_e), T_EI, T_FRAMES, node_inputs=False, dim_size=E
    ).numpy()

    # masked scalarize/vectorize: numerator restricted to both-unmasked
    # edges, denominator still counts all edges by source
    nm = torch.from_numpy(NODE_MASK)
    outs["scalarize_node_masked"] = comp.scalarize(
        torch.from_numpy(v9), T_EI, T_FRAMES, node_inputs=True,
        enable_e3_equivariance=False, dim_size=N, node_mask=nm,
    ).numpy()
    outs["vectorize_node_masked"] = comp.vectorize(
        torch.from_numpy(gate_n), T_EI, T_FRAMES, node_inputs=True,
        dim_size=N, node_mask=nm,
    ).numpy()

    save_case(
        "geometry",
        {"kind": "geometry", "N": N, "E": E,
         "batch_index_split": 6, "node_mask_holes": [2, 7]},
        {"x": X, "edge_index": EDGE_INDEX, "v9": v9, "e9": e9,
         "gate_n": gate_n, "gate_e": gate_e, "node_mask": NODE_MASK},
        None,
        outs,
    )


# ---------------------------------------------------------------- layer norm
def gen_layer_norm():
    s, v = sv_inputs(8, 4, N)
    m = comp.GCPLayerNorm(comp.ScalarVector(8, 4))
    with torch.no_grad():
        m.scalar_norm.weight.uniform_(0.5, 1.5)
        m.scalar_norm.bias.uniform_(-0.3, 0.3)
    out = m(comp.ScalarVector(torch.from_numpy(s), torch.from_numpy(v)))
    save_case(
        "gcp_layer_norm",
        {"kind": "layer_norm", "ds": 8, "dv": 4},
        {"s": s, "v": v},
        m,
        {"scalar": out.scalar.numpy(), "vector": out.vector.numpy()},
    )


# ---------------------------------------------------------------- GCP units
def run_gcp_case(name, cls, cfg_over, in_dims, out_dims, node_inputs,
                 nonlinearities=("relu", None), extra_kwargs=None):
    cfg = base_cfg(**cfg_over)
    rows = N if node_inputs else E
    s, v = sv_inputs(in_dims[0], in_dims[1], rows)
    kwargs = dict(
        nonlinearities=tuple(nonlinearities),
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
    )
    kwargs.update(extra_kwargs or {})
    module = cls(comp.ScalarVector(*in_dims), comp.ScalarVector(*out_dims), **kwargs)
    module.eval()
    sv = (
        comp.ScalarVector(torch.from_numpy(s), torch.from_numpy(v))
        if in_dims[1]
        else torch.from_numpy(s)
    )
    with torch.no_grad():
        out = module(sv, T_EI, T_FRAMES, node_inputs=node_inputs)
    if isinstance(out, comp.ScalarVector):
        outputs = {"scalar": out.scalar.numpy(), "vector": out.vector.numpy()}
    else:
        outputs = {"scalar": out.numpy()}
    save_case(
        name,
        {
            "kind": "gcp",
            "cls": cls.__name__,
            "in_dims": list(in_dims),
            "out_dims": list(out_dims),
            "node_inputs": node_inputs,
            "nonlinearities": list(nonlinearities),
            "cfg": cfg_meta(cfg),
            "extra_kwargs": {
                k: v for k, v in (extra_kwargs or {}).items()
            },
        },
        {"s": s, "v": v, "edge_index": EDGE_INDEX, "frames": FRAMES, "x": X},
        module,
        outputs,
    )


def gen_gcp_units():
    # GCP2 variants
    run_gcp_case("gcp2_default_node", gcpnet.GCP2, {}, (8, 4), (6, 3), True)
    run_gcp_case("gcp2_default_edge", gcpnet.GCP2, {}, (8, 4), (6, 3), False)
    run_gcp_case(
        "gcp2_frame_gate", gcpnet.GCP2,
        dict(frame_gate=True, vector_gate=False), (8, 4), (6, 3), True,
        nonlinearities=("relu", "sigmoid"),
    )
    run_gcp_case(
        "gcp2_self_gate", gcpnet.GCP2, dict(vector_gate=False),
        (8, 4), (6, 3), True, nonlinearities=("relu", "sigmoid"),
    )
    run_gcp_case(
        "gcp2_bottleneck_residual", gcpnet.GCP2,
        dict(bottleneck=2, vector_residual=True), (8, 4), (6, 4), True,
    )
    run_gcp_case(
        "gcp2_e3", gcpnet.GCP2, dict(enable_e3_equivariance=True),
        (8, 4), (6, 3), True,
    )
    run_gcp_case("gcp2_scalar_out", gcpnet.GCP2, {}, (8, 4), (6, 0), True)
    run_gcp_case("gcp2_vector_from_zero", gcpnet.GCP2, {}, (8, 0), (6, 3), True)
    run_gcp_case(
        "gcp2_ablate_frames", gcpnet.GCP2, dict(ablate_frame_updates=True),
        (8, 4), (6, 3), True,
    )
    # GCP v1 variants
    run_gcp_case("gcp1_default", gcpnet.GCP, {}, (8, 4), (6, 3), True)
    run_gcp_case(
        "gcp1_frame_gate", gcpnet.GCP,
        dict(frame_gate=True, vector_gate=False, vector_frame_residual=True),
        (8, 4), (6, 3), True, nonlinearities=("relu", "sigmoid"),
    )
    run_gcp_case(
        "gcp1_sigma_frame_gate", gcpnet.GCP,
        dict(sigma_frame_gate=True, vector_gate=False), (8, 4), (6, 3), True,
        nonlinearities=("relu", "sigmoid"),
    )
    run_gcp_case("gcp1_scalar_out", gcpnet.GCP, {}, (8, 4), (6, 0), True)
    # GCP3 feedforward_out
    run_gcp_case(
        "gcp3_feedforward", gcpnet.GCP3, {}, (8, 4), (6, 3), True,
        extra_kwargs=dict(feedforward_out=True),
    )


# ------------------------------------------------------------- message passing
def run_mp_case(name, cfg_over, lc_over, reduce_function="mean",
                use_attention=False, aggregate_with_row=False):
    cfg = base_cfg(**cfg_over)
    lc = make_layer_cfg(**lc_over)
    nd, ed = comp.ScalarVector(8, 4), comp.ScalarVector(6, 2)
    module = gcpnet.GCPMessagePassing(
        nd, nd, ed, cfg=cfg, mp_cfg=lc.mp_cfg,
        reduce_function=reduce_function,
        use_scalar_message_attention=use_attention,
        aggregate_with_row=aggregate_with_row,
    )
    module.eval()
    hs, hv = sv_inputs(8, 4, N)
    es, ev = sv_inputs(6, 2, E)
    with torch.no_grad():
        out = module(
            comp.ScalarVector(torch.from_numpy(hs), torch.from_numpy(hv)),
            comp.ScalarVector(torch.from_numpy(es), torch.from_numpy(ev)),
            T_EI, T_FRAMES,
        )
    save_case(
        name,
        {
            "kind": "message_passing",
            "node_dims": [8, 4], "edge_dims": [6, 2],
            "reduce_function": reduce_function,
            "use_scalar_message_attention": use_attention,
            "aggregate_with_row": aggregate_with_row,
            "cfg": cfg_meta(cfg), "layer_cfg": layer_meta(lc),
        },
        {"hs": hs, "hv": hv, "es": es, "ev": ev,
         "edge_index": EDGE_INDEX, "frames": FRAMES},
        module,
        {"scalar": out.scalar.numpy(), "vector": out.vector.numpy()},
    )


def gen_message_passing():
    run_mp_case("mp_mean_resgcp", {}, {})
    run_mp_case(
        "mp_sum_attention_row",
        dict(default_bottleneck=2),
        dict(mp_cfg=dict(num_message_layers=3)),
        reduce_function="sum", use_attention=True, aggregate_with_row=True,
    )
    run_mp_case(
        "mp_no_residual", {}, dict(mp_cfg=dict(use_residual_message_gcp=False,
                                               num_message_layers=2)),
    )


# ---------------------------------------------------------------- interactions
def run_interactions_case(name, cls, cfg_over, lc_over, *, autoregressive=False,
                          updating_node_positions=False, node_mask=None):
    cfg = base_cfg(**cfg_over)
    lc = make_layer_cfg(**lc_over)
    nd, ed = comp.ScalarVector(8, 4), comp.ScalarVector(6, 2)
    kwargs = dict(dropout=0.0, updating_node_positions=updating_node_positions)
    if cls is gcpnet.GCPInteractions:
        kwargs["autoregressive"] = autoregressive
    module = cls(nd, ed, cfg=cfg, layer_cfg=lc, **kwargs)
    module.eval()
    hs, hv = sv_inputs(8, 4, N)
    es, ev = sv_inputs(6, 2, E)
    inputs = {"hs": hs, "hv": hv, "es": es, "ev": ev,
              "edge_index": EDGE_INDEX, "frames": FRAMES, "x": X}
    call_kwargs = {}
    if autoregressive:
        rs, rv = sv_inputs(8, 4, N)
        inputs["rs"], inputs["rv"] = rs, rv
        call_kwargs["node_rep_regressive"] = comp.ScalarVector(
            torch.from_numpy(rs), torch.from_numpy(rv)
        )
    if node_mask is not None:
        inputs["node_mask"] = node_mask
        call_kwargs["node_mask"] = torch.from_numpy(node_mask)
    if updating_node_positions:
        call_kwargs["node_pos"] = torch.from_numpy(X)
    with torch.no_grad():
        # clone: GCPInteractions' masked merge writes into its input tensors
        # in place (gcpnet.py:1249-1251), which would corrupt the saved
        # numpy inputs through from_numpy's shared memory
        out = module(
            comp.ScalarVector(
                torch.from_numpy(hs).clone(), torch.from_numpy(hv).clone()
            ),
            comp.ScalarVector(
                torch.from_numpy(es).clone(), torch.from_numpy(ev).clone()
            ),
            T_EI, T_FRAMES, **call_kwargs,
        )
    if updating_node_positions:
        (s_out, v_out), pos = out
        outputs = {"scalar": s_out.numpy(), "vector": v_out.numpy(),
                   "pos": pos.numpy()}
    else:
        outputs = {"scalar": out[0].numpy(), "vector": out[1].numpy()}
    save_case(
        name,
        {
            "kind": "interactions", "cls": cls.__name__,
            "node_dims": [8, 4], "edge_dims": [6, 2],
            "autoregressive": autoregressive,
            "updating_node_positions": updating_node_positions,
            "has_node_mask": node_mask is not None,
            "cfg": cfg_meta(cfg), "layer_cfg": layer_meta(lc),
        },
        inputs, module, outputs,
    )


def gen_interactions():
    run_interactions_case("interactions_postnorm", gcpnet.GCPInteractions, {}, {})
    run_interactions_case(
        "interactions_prenorm_ff3", gcpnet.GCPInteractions, {},
        dict(pre_norm=True, num_feedforward_layers=3),
    )
    run_interactions_case(
        "interactions_posupdate", gcpnet.GCPInteractions,
        dict(ablate_x_force_update=False, node_positions_weight=1.5), {},
        updating_node_positions=True,
    )
    run_interactions_case(
        "interactions_autoregressive", gcpnet.GCPInteractions, {}, {},
        autoregressive=True,
    )
    run_interactions_case(
        "interactions_node_mask", gcpnet.GCPInteractions, {}, {},
        node_mask=NODE_MASK_TAIL,
    )
    run_interactions_case(
        "interactions2_default", gcpnet.GCPInteractions2, {},
        dict(mp_cfg=dict(num_message_layers=3)),
    )
    run_interactions_case(
        "interactions2_attention_posupdate", gcpnet.GCPInteractions2, {},
        dict(use_scalar_message_attention=True, aggregate_with_row=True,
             pre_norm=True),
        updating_node_positions=True,
    )
    run_interactions_case(
        "interactions2_node_mask", gcpnet.GCPInteractions2, {}, {},
        node_mask=NODE_MASK,
    )
    # GCP3-based interactions2 (the EQ/AR configuration)
    run_interactions_case(
        "interactions2_gcp3", gcpnet.GCPInteractions2,
        dict(selected_GCP=gcpnet.GCP3), dict(mp_cfg=dict(num_message_layers=2)),
    )


# ---------------------------------------------------------------- embedding
def gen_embedding():
    for lig_flag, name in ((False, "embedding_prenorm"),
                           (True, "embedding_lba_ligflag")):
        cfg = base_cfg(concatenate_lig_flag=lig_flag)
        module = gcpnet.GCPEmbedding(
            comp.ScalarVector(6, 2), comp.ScalarVector(9, 4),
            comp.ScalarVector(12, 5), comp.ScalarVector(10, 3),
            num_atom_types=9, cfg=cfg, pre_norm=True,
        )
        module.eval()
        h_idx = rng.integers(0, 9, size=N).astype(np.int64)
        _, chi = sv_inputs(0, 4, N)
        es, ev = sv_inputs(6, 2, E)
        lig = rng.integers(0, 2, size=N).astype(np.int64)
        batch = sys.modules["torch_geometric.data"].Batch(
            h=torch.from_numpy(h_idx), chi=torch.from_numpy(chi),
            e=torch.from_numpy(es), xi=torch.from_numpy(ev),
            edge_index=T_EI, f_ij=T_FRAMES,
            lig_flag=torch.from_numpy(lig),
        )
        with torch.no_grad():
            node_rep, edge_rep = module(batch)
        save_case(
            name,
            {"kind": "embedding", "concatenate_lig_flag": lig_flag,
             "edge_input_dims": [6, 2], "node_input_dims": [9, 4],
             "edge_hidden_dims": [12, 5], "node_hidden_dims": [10, 3],
             "num_atom_types": 9, "pre_norm": True, "cfg": cfg_meta(cfg)},
            {"h": h_idx, "chi": chi, "es": es, "ev": ev, "lig_flag": lig,
             "edge_index": EDGE_INDEX, "frames": FRAMES},
            module,
            {"node_scalar": node_rep.scalar.numpy(),
             "node_vector": node_rep.vector.numpy(),
             "edge_scalar": edge_rep.scalar.numpy(),
             "edge_vector": edge_rep.vector.numpy()},
        )


# ---------------------------------------------------------------- decoder
def gen_decoder():
    for residual, name in ((False, "decoder_sequential"),
                           (True, "decoder_residual")):
        module = gcpnet.GCPMLPDecoder(
            hidden_dim=10, vocab_size=20, num_layers=3,
            residual_updates=residual,
        )
        module.eval()
        h = rng.normal(size=(N, 10)).astype(np.float32)
        with torch.no_grad():
            logits, log_probs = module(torch.from_numpy(h))
        save_case(
            name,
            {"kind": "decoder", "hidden_dim": 10, "vocab_size": 20,
             "num_layers": 3, "residual_updates": residual},
            {"h": h},
            module,
            {"logits": logits.numpy(), "log_probs": log_probs.numpy()},
        )


if __name__ == "__main__":
    torch.set_grad_enabled(False)
    gen_geometry()
    gen_layer_norm()
    gen_gcp_units()
    gen_message_passing()
    gen_interactions()
    gen_embedding()
    gen_decoder()
    print("done")
