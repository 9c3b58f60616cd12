"""Whole-model golden parity (VERDICT r2 item 7): full task-model forwards
(centralize -> localize -> embed -> interaction layers -> head) checked
against scripts/golden/numpy_reference.py — an independent float64 numpy
re-derivation of the reference PyTorch composition in the reference's own
[N, c, 3] layout.  The flax models run on PADDED batches; the numpy
reference runs the unpadded graphs — agreement also certifies the padding
masks.

Generated fixtures: scripts/golden/generate_model_golden.py writes
tests/golden/model_{lba,nms}.npz from the numpy side for cross-environment
regression pinning.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts" / "golden"))
import numpy_reference as npref  # noqa: E402

from gcpnet_tpu.config.schema import LayerCfg, ModelCfg, ModuleCfg, MPCfg
from gcpnet_tpu.data.batching import Bucket, batches_from_dataset
from gcpnet_tpu.graph import GraphData
from gcpnet_tpu.models import GCPNetLBA, GCPNetNMS

# compile-heavy integration tier — EXCEPT the NMS case (cheapest whole-model
# golden, ~5 s), which stays in the fast per-commit gate so every commit
# runs at least one full-composition parity check (VERDICT r3 item 7)
heavy = pytest.mark.heavy

RNG = np.random.default_rng(11)

N_PER, E_PER, G = 10, 30, 2
NODE_DIMS, EDGE_DIMS = (16, 4), (8, 4)


def _graphs(ds, dv, de, dve, int_h):
    gs = []
    for _ in range(G):
        gs.append(
            GraphData(
                h=(RNG.integers(0, 9, size=N_PER).astype(np.int32) if int_h
                   else RNG.normal(size=(N_PER, ds)).astype(np.float32)),
                chi=RNG.normal(size=(N_PER, dv, 3)).astype(np.float32),
                e=RNG.normal(size=(E_PER, de)).astype(np.float32),
                xi=RNG.normal(size=(E_PER, dve, 3)).astype(np.float32),
                x=(RNG.normal(size=(N_PER, 3)) * 4).astype(np.float32),
                senders=RNG.integers(0, N_PER, size=E_PER).astype(np.int32),
                receivers=RNG.integers(0, N_PER, size=E_PER).astype(np.int32),
                extras={"label": np.float32(0.0)},
            )
        )
    return gs


def _padded_batch(graphs):
    bucket = Bucket(
        num_nodes=N_PER * G + 7, num_edges=E_PER * G + 13, num_graphs=G + 1
    )
    return next(
        batches_from_dataset(
            graphs, bucket, drop_last=False, extra_graph_keys=("label",)
        )
    )


def _concat_for_numpy(graphs):
    """Unpadded concatenation in reference Batch layout (float64)."""
    h = np.concatenate([np.atleast_1d(g.h) for g in graphs]).astype(
        np.float64 if graphs[0].h.ndim > 1 else np.int64
    )
    chi = np.concatenate([g.chi for g in graphs]).astype(np.float64)
    e = np.concatenate([g.e for g in graphs]).astype(np.float64)
    xi = np.concatenate([g.xi for g in graphs]).astype(np.float64)
    x = np.concatenate([g.x for g in graphs]).astype(np.float64)
    row, col, bidx = [], [], []
    off = 0
    for gi, g in enumerate(graphs):
        row.append(g.senders + off)
        col.append(g.receivers + off)
        bidx.append(np.full(g.num_nodes, gi))
        off += g.num_nodes
    return (h, chi, e, xi, x, np.concatenate(row), np.concatenate(col),
            np.concatenate(bidx))


@heavy
def test_lba_whole_model_matches_numpy_reference():
    # Also covers PSR: GCPNetPSR IS GCPNetLBA (identical trunk + pooled
    # invariant head, models/lba.py; the reference's PSR module differs
    # from LBA only in data/metrics, gcpnet_psr_module.py:161-192), so
    # this case is the PSR whole-model golden too.
    graphs = _graphs(0, 2, 8, 1, int_h=True)
    batch = _padded_batch(graphs)
    model = GCPNetLBA(
        model_cfg=ModelCfg(
            chi_input_dim=2, e_input_dim=8, xi_input_dim=1,
            h_hidden_dim=NODE_DIMS[0], chi_hidden_dim=NODE_DIMS[1],
            e_hidden_dim=EDGE_DIMS[0], xi_hidden_dim=EDGE_DIMS[1],
            num_encoder_layers=2, dropout=0.0,
        ),
        module_cfg=ModuleCfg(),
        layer_cfg=LayerCfg(mp_cfg=MPCfg(num_message_layers=3)),
        num_atom_types=9,
    )
    dev = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a) if a is not None else None, batch
    )
    params = model.init(jax.random.key(2), dev, True)
    out_flax = np.asarray(model.apply(params, dev, True))[:G]

    h, chi, e, xi, x, row, col, bidx = _concat_for_numpy(graphs)
    out_np = npref.lba_forward(
        jax.device_get(params)["params"], h, chi, e, xi, x, row, col, bidx, G,
        num_atom_types=9, node_in_dims=(9, 2), edge_in_dims=(8, 1),
        node_dims=NODE_DIMS, edge_dims=EDGE_DIMS,
        num_layers=2, num_message_layers=3,
    )
    np.testing.assert_allclose(out_flax, out_np, atol=1e-4)


def test_nms_whole_model_matches_numpy_reference():
    graphs = _graphs(1, 3, 8, 1, int_h=False)
    batch = _padded_batch(graphs)
    module_cfg = ModuleCfg(ablate_x_force_update=False)
    model = GCPNetNMS(
        model_cfg=ModelCfg(
            h_input_dim=1, chi_input_dim=3, e_input_dim=8, xi_input_dim=1,
            h_hidden_dim=NODE_DIMS[0], chi_hidden_dim=NODE_DIMS[1],
            e_hidden_dim=EDGE_DIMS[0], xi_hidden_dim=EDGE_DIMS[1],
            num_encoder_layers=2, dropout=0.0,
        ),
        module_cfg=module_cfg,
        layer_cfg=LayerCfg(mp_cfg=MPCfg(num_message_layers=2)),
    )
    dev = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a) if a is not None else None, batch
    )
    params = model.init(jax.random.key(3), dev, True)
    out_flax = np.asarray(model.apply(params, dev, True))

    h, chi, e, xi, x, row, col, bidx = _concat_for_numpy(graphs)
    out_np = npref.nms_forward(
        jax.device_get(params)["params"], h, chi, e, xi, x, row, col, bidx, G,
        node_in_dims=(1, 3), edge_in_dims=(8, 1),
        node_dims=NODE_DIMS, edge_dims=EDGE_DIMS,
        num_layers=2, num_message_layers=2, ablate_x_force_update=False,
    )
    # compare real node rows (padded batch reorders nothing within shard 0)
    real = np.asarray(batch.node_pad_mask)
    np.testing.assert_allclose(out_flax[real], out_np, atol=1e-4)


@heavy
def test_eq_whole_model_matches_numpy_reference():
    """GCP3 / GCPInteractions2 trunk (attention + aggregate_with_row + one
    feedforward_out FF layer) + atom->residue pooling head."""
    from gcpnet_tpu.data.eq import _globalize_residues
    from gcpnet_tpu.models import GCPNetEQ

    num_res = 5
    graphs = []
    for _ in range(G):
        n = num_res * 2
        res_idx = np.repeat(np.arange(num_res), 2).astype(np.int32)
        graphs.append(
            GraphData(
                h=RNG.normal(size=(n, 9)).astype(np.float32),
                chi=RNG.normal(size=(n, 2, 3)).astype(np.float32),
                e=RNG.normal(size=(E_PER, 18)).astype(np.float32),
                xi=RNG.normal(size=(E_PER, 1, 3)).astype(np.float32),
                x=(RNG.normal(size=(n, 3)) * 4).astype(np.float32),
                senders=RNG.integers(0, n, size=E_PER).astype(np.int32),
                receivers=RNG.integers(0, n, size=E_PER).astype(np.int32),
                extras={
                    "atom_types": RNG.integers(0, 38, size=n).astype(np.int32),
                    "atom_residue_idx": res_idx,
                    "label": RNG.random(num_res).astype(np.float32),
                    "res_mask": np.ones(num_res, np.float32),
                },
            )
        )
    bucket = Bucket(
        num_nodes=num_res * 2 * G + 6, num_edges=E_PER * G + 13,
        num_graphs=G + 1,
    )
    batch = next(
        batches_from_dataset(graphs, bucket, drop_last=False)
    )
    batch = _globalize_residues(batch, max_residues=num_res * G + 3)

    model = GCPNetEQ(
        model_cfg=ModelCfg(
            h_input_dim=9, chi_input_dim=2, e_input_dim=18, xi_input_dim=1,
            h_hidden_dim=NODE_DIMS[0], chi_hidden_dim=NODE_DIMS[1],
            e_hidden_dim=EDGE_DIMS[0], xi_hidden_dim=EDGE_DIMS[1],
            num_encoder_layers=2, dropout=0.0,
        ),
        module_cfg=ModuleCfg(selected_gcp="GCP3"),
        layer_cfg=LayerCfg(
            use_scalar_message_attention=True, aggregate_with_row=True,
            num_feedforward_layers=1, mp_cfg=MPCfg(num_message_layers=3),
        ),
    )
    dev = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a) if a is not None else None, batch
    )
    params = model.init(jax.random.key(5), dev, True)
    out_flax = np.asarray(model.apply(params, dev, True))

    h, chi, e, xi, x, row, col, bidx = _concat_for_numpy(graphs)
    atom_types = np.concatenate([g.extras["atom_types"] for g in graphs])
    res_idx_global = np.concatenate(
        [g.extras["atom_residue_idx"] + gi * num_res
         for gi, g in enumerate(graphs)]
    )
    p = jax.device_get(params)["params"]
    out_np = npref.eq_forward(
        p, h, chi, e, xi, x, atom_types, res_idx_global, num_res * G,
        row, col, bidx, G,
        num_atom_types=38, node_in_dims=(9, 2), edge_in_dims=(18, 1),
        node_dims=NODE_DIMS, edge_dims=EDGE_DIMS,
        num_layers=2, num_message_layers=3,
    )
    # flax pools residues into the padded global residue table; the first
    # num_res*G rows are the real residues in order
    np.testing.assert_allclose(out_flax[: num_res * G], out_np, atol=1e-4)


@heavy
def test_cpd_whole_model_matches_numpy_reference():
    """Encoder + autoregressive decoder (causal sequence edges, forward/
    backward edge split, count normalization) with a real node mask —
    exercises the masked centralize/localize/subgraph-FF composition."""
    from gcpnet_tpu.models import GCPNetCPD

    n = 14
    graphs = []
    for _ in range(G):
        graphs.append(
            GraphData(
                h=RNG.normal(size=(n, 6)).astype(np.float32),
                chi=RNG.normal(size=(n, 3, 3)).astype(np.float32),
                e=RNG.normal(size=(n * 4, 32)).astype(np.float32),
                xi=RNG.normal(size=(n * 4, 1, 3)).astype(np.float32),
                x=(RNG.normal(size=(n, 3)) * 4).astype(np.float32),
                senders=RNG.integers(0, n, size=n * 4).astype(np.int32),
                receivers=RNG.integers(0, n, size=n * 4).astype(np.int32),
                node_mask=RNG.random(n) > 0.15,
                extras={"seq": RNG.integers(0, 20, size=n).astype(np.int32)},
            )
        )
    bucket = Bucket(num_nodes=n * G + 6, num_edges=n * 4 * G + 10,
                    num_graphs=G + 1)
    batch = next(batches_from_dataset(graphs, bucket, drop_last=False))

    model = GCPNetCPD(
        model_cfg=ModelCfg(
            h_hidden_dim=NODE_DIMS[0], chi_hidden_dim=NODE_DIMS[1],
            e_hidden_dim=EDGE_DIMS[0], xi_hidden_dim=EDGE_DIMS[1],
            num_encoder_layers=2, num_decoder_layers=2, output_dim=20,
            dropout=0.0,
        ),
        module_cfg=ModuleCfg(),
        layer_cfg=LayerCfg(mp_cfg=MPCfg(num_message_layers=2)),
        node_input_dims=(6, 3),
        edge_input_dims=(32, 1),
        autoregressive_decoder=True,
    )
    dev = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a) if a is not None else None, batch
    )
    params = model.init(jax.random.key(7), dev, True)
    logits_flax, _ = model.apply(params, dev, True)
    logits_flax = np.asarray(logits_flax)

    h, chi, e, xi, x, row, col, bidx = _concat_for_numpy(graphs)
    seq = np.concatenate([g.extras["seq"] for g in graphs])
    node_mask = np.concatenate([g.node_mask for g in graphs]).astype(bool)
    out_np = npref.cpd_forward(
        jax.device_get(params)["params"], h, chi, e, xi, x, seq, row, col,
        bidx, G,
        node_in_dims=(6, 3), edge_in_dims=(32, 1),
        node_dims=NODE_DIMS, edge_dims=EDGE_DIMS, vocab=20,
        num_encoder_layers=2, num_decoder_layers=2, num_message_layers=2,
        node_mask=node_mask,
    )
    real = np.asarray(batch.node_pad_mask)
    valid = node_mask  # compare semantically valid rows
    np.testing.assert_allclose(
        logits_flax[real][valid], out_np[valid], atol=1e-4
    )


@heavy
def test_ar_whole_model_matches_numpy_reference():
    """Position-updating GCPInteractions2 trunk (GCP3, silu/silu) +
    decentralize + per-residue Ca-offset head — the AR composition
    (gcpnet_ar_module.py:139-175)."""
    from gcpnet_tpu.data.ar import _globalize_ar_residues
    from gcpnet_tpu.models import GCPNetAR

    num_res = 5
    graphs = []
    for _ in range(G):
        n = num_res * 3
        res_idx = np.repeat(np.arange(num_res), 3).astype(np.int32)
        graphs.append(
            GraphData(
                h=RNG.normal(size=(n, 10)).astype(np.float32),
                chi=RNG.normal(size=(n, 2, 3)).astype(np.float32),
                e=RNG.normal(size=(E_PER, 12)).astype(np.float32),
                xi=RNG.normal(size=(E_PER, 1, 3)).astype(np.float32),
                x=(RNG.normal(size=(n, 3)) * 4).astype(np.float32),
                senders=RNG.integers(0, n, size=E_PER).astype(np.int32),
                receivers=RNG.integers(0, n, size=E_PER).astype(np.int32),
                extras={
                    "atom_residue_idx": res_idx,
                    "ca_x_local": (RNG.normal(size=(num_res, 3)) * 4).astype(
                        np.float32
                    ),
                    "label": (RNG.normal(size=(n, 3)) * 4).astype(np.float32),
                },
            )
        )
    bucket = Bucket(
        num_nodes=num_res * 3 * G + 6, num_edges=E_PER * G + 13,
        num_graphs=G + 1,
    )
    batch = next(batches_from_dataset(graphs, bucket, drop_last=False))
    batch = _globalize_ar_residues(batch, max_residues=num_res * G + 3)

    model = GCPNetAR(
        model_cfg=ModelCfg(
            h_input_dim=10, chi_input_dim=2, e_input_dim=12, xi_input_dim=1,
            h_hidden_dim=NODE_DIMS[0], chi_hidden_dim=NODE_DIMS[1],
            e_hidden_dim=EDGE_DIMS[0], xi_hidden_dim=EDGE_DIMS[1],
            num_encoder_layers=2, dropout=0.0,
        ),
        module_cfg=ModuleCfg(
            selected_gcp="GCP3", scalar_nonlinearity="silu",
            vector_nonlinearity="silu",
        ),
        layer_cfg=LayerCfg(
            use_scalar_message_attention=True, aggregate_with_row=True,
            num_feedforward_layers=1, mp_cfg=MPCfg(num_message_layers=3),
        ),
    )
    dev = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a) if a is not None else None, batch
    )
    params = model.init(jax.random.key(9), dev, True)
    out_flax = np.asarray(model.apply(params, dev, True))

    h, chi, e, xi, x, row, col, bidx = _concat_for_numpy(graphs)
    res_idx_global = np.concatenate(
        [g.extras["atom_residue_idx"] + gi * num_res
         for gi, g in enumerate(graphs)]
    )
    ca_x = np.concatenate(
        [g.extras["ca_x_local"] for g in graphs]
    ).astype(np.float64)
    out_np = npref.ar_forward(
        jax.device_get(params)["params"], h, chi, e, xi, x,
        res_idx_global, ca_x, row, col, bidx, G,
        node_in_dims=(10, 2), edge_in_dims=(12, 1),
        node_dims=NODE_DIMS, edge_dims=EDGE_DIMS,
        num_layers=2, num_message_layers=3, num_feedforward_layers=1,
        nonlinearities=("silu", "silu"),
    )
    real = np.asarray(batch.node_pad_mask)
    np.testing.assert_allclose(out_flax[real], out_np, atol=1e-4)


@heavy
def test_rs_whole_model_matches_numpy_reference():
    """RS head variant: float node scalars (no atom embedding), leakyrelu
    dense head, E(3) mode (|x_cross| scalarize component) — the chirality
    probe configuration (gcpnet_rs_module.py:158-198)."""
    from gcpnet_tpu.models import GCPNetRS

    graphs = _graphs(7, 2, 8, 1, int_h=False)
    batch = _padded_batch(graphs)
    model = GCPNetRS(
        model_cfg=ModelCfg(
            h_input_dim=7, chi_input_dim=2, e_input_dim=8, xi_input_dim=1,
            h_hidden_dim=NODE_DIMS[0], chi_hidden_dim=NODE_DIMS[1],
            e_hidden_dim=EDGE_DIMS[0], xi_hidden_dim=EDGE_DIMS[1],
            num_encoder_layers=2, dropout=0.0,
        ),
        module_cfg=ModuleCfg(enable_e3_equivariance=True),
        layer_cfg=LayerCfg(mp_cfg=MPCfg(num_message_layers=3)),
    )
    dev = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a) if a is not None else None, batch
    )
    params = model.init(jax.random.key(4), dev, True)
    out_flax = np.asarray(model.apply(params, dev, True))[:G]

    h, chi, e, xi, x, row, col, bidx = _concat_for_numpy(graphs)
    out_np = npref.lba_forward(
        jax.device_get(params)["params"], h, chi, e, xi, x, row, col, bidx, G,
        num_atom_types=0, node_in_dims=(7, 2), edge_in_dims=(8, 1),
        node_dims=NODE_DIMS, edge_dims=EDGE_DIMS,
        num_layers=2, num_message_layers=3,
        dense_activation="leakyrelu", gcp_kwargs={"e3": True},
    )
    np.testing.assert_allclose(out_flax, out_np, atol=1e-4)
