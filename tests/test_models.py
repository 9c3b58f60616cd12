"""Per-task model smoke tests: one forward + loss + grad on synthetic
padded batches with the reference's hidden dims (scaled-down layer counts
for CPU speed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcpnet_tpu.config.schema import LayerCfg, ModelCfg, ModuleCfg, MPCfg
from gcpnet_tpu.data.batching import Bucket, batches_from_dataset
from gcpnet_tpu.graph import GraphData
from gcpnet_tpu.models import (
    GCPNetAR,
    GCPNetCPD,
    GCPNetEQ,
    GCPNetLBA,
    GCPNetNMS,
    GCPNetRS,
    LOSS_REGISTRY,
)

RNG = np.random.default_rng(0)


def _small_layer_cfg(**kw):
    return LayerCfg(mp_cfg=MPCfg(num_message_layers=2), **kw)


def random_graph(n, e, ds, dv, de, dve, int_h=False, mask=False, extras=None):
    g = GraphData(
        h=(
            RNG.integers(0, 9, size=n).astype(np.int32)
            if int_h
            else RNG.normal(size=(n, ds)).astype(np.float32)
        ),
        chi=RNG.normal(size=(n, dv, 3)).astype(np.float32),
        e=RNG.normal(size=(e, de)).astype(np.float32),
        xi=RNG.normal(size=(e, dve, 3)).astype(np.float32),
        x=(RNG.normal(size=(n, 3)) * 4).astype(np.float32),
        senders=RNG.integers(0, n, size=e).astype(np.int32),
        receivers=RNG.integers(0, n, size=e).astype(np.int32),
        node_mask=(RNG.random(n) > 0.1) if mask else None,
        extras=extras or {},
    )
    return g


def make_batch(graphs, extra_graph_keys=()):
    n = max(g.num_nodes for g in graphs) * len(graphs) + 8
    e = max(g.num_edges for g in graphs) * len(graphs) + 8
    bucket = Bucket(num_nodes=n, num_edges=e, num_graphs=len(graphs) + 1)
    return next(
        batches_from_dataset(
            graphs, bucket, num_shards=1, drop_last=False,
            extra_graph_keys=extra_graph_keys,
        )
    )


def run_model(model, batch, loss_name, rngs=None):
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    params = jax.jit(model.init, static_argnums=(2,))(
        jax.random.key(0), batch, True
    )

    def loss_of(p):
        out = model.apply(p, batch, True)
        loss, _ = LOSS_REGISTRY[loss_name](out, batch)
        return loss

    # jit: one whole-model compile (persisted by the compilation cache)
    # instead of minutes of eager per-op dispatch
    loss, grads = jax.jit(jax.value_and_grad(loss_of))(params)
    gnorm = sum(
        float(jnp.sum(g**2)) for g in jax.tree_util.tree_leaves(grads)
    )
    assert np.isfinite(float(loss)), "loss is not finite"
    assert np.isfinite(gnorm) and gnorm > 0, "gradients are zero/non-finite"
    return float(loss)


def test_lba_model():
    graphs = [
        random_graph(20, 60, 0, 2, 16, 1, int_h=True,
                     extras={"label": np.float32(1.5)})
        for _ in range(2)
    ]
    batch = make_batch(graphs, extra_graph_keys=("label",))
    model = GCPNetLBA(
        model_cfg=ModelCfg(
            chi_input_dim=2, e_input_dim=16, xi_input_dim=1,
            h_hidden_dim=32, chi_hidden_dim=8, e_hidden_dim=16,
            xi_hidden_dim=4, num_encoder_layers=2,
        ),
        module_cfg=ModuleCfg(),
        layer_cfg=_small_layer_cfg(),
        num_atom_types=9,
    )
    run_model(model, batch, "GCPNetLBA")


@pytest.mark.heavy  # two extra whole-model compiles
@pytest.mark.parametrize("remat_mode", [True, "dots"])
def test_lba_model_remat_matches_plain(remat_mode):
    """remat must (a) not crash on the static `deterministic` flag
    (ADVICE r2) and (b) produce identical losses/grads to the plain path,
    including with dropout active — for both full remat and the
    dots_saveable policy (save matmul outputs, recompute elementwise)."""
    graphs = [
        random_graph(20, 60, 0, 2, 16, 1, int_h=True,
                     extras={"label": np.float32(1.5)})
        for _ in range(2)
    ]
    batch = make_batch(graphs, extra_graph_keys=("label",))
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

    def build(remat):
        return GCPNetLBA(
            model_cfg=ModelCfg(
                chi_input_dim=2, e_input_dim=16, xi_input_dim=1,
                h_hidden_dim=32, chi_hidden_dim=8, e_hidden_dim=16,
                xi_hidden_dim=4, num_encoder_layers=2, dropout=0.1,
            ),
            module_cfg=ModuleCfg(),
            layer_cfg=_small_layer_cfg(),
            num_atom_types=9,
            remat=remat,
        )

    plain, rem = build(False), build(remat_mode)
    params = jax.jit(plain.init, static_argnums=(2,))(
        jax.random.key(0), batch, True
    )

    def loss_of(model, p, deterministic):
        def f(p):
            out = model.apply(
                p, batch, deterministic,
                rngs=None if deterministic else {"dropout": jax.random.key(7)},
            )
            loss, _ = LOSS_REGISTRY["GCPNetLBA"](out, batch)
            return loss

        return jax.jit(jax.value_and_grad(f))(p)

    for det in (True, False):
        l0, g0 = loss_of(plain, params, det)
        l1, g1 = loss_of(rem, params, det)
        assert np.isfinite(float(l0))
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5), g0, g1
        )


def test_rs_model():
    graphs = [
        random_graph(16, 30, 52, 2, 30, 1, extras={"label": np.float32(1.0)})
        for _ in range(2)
    ]
    batch = make_batch(graphs, extra_graph_keys=("label",))
    model = GCPNetRS(
        model_cfg=ModelCfg(
            h_input_dim=52, chi_input_dim=2, e_input_dim=30, xi_input_dim=1,
            h_hidden_dim=32, chi_hidden_dim=8, e_hidden_dim=16,
            xi_hidden_dim=4, num_encoder_layers=2,
        ),
        module_cfg=ModuleCfg(scalar_nonlinearity="leakyrelu"),
        layer_cfg=_small_layer_cfg(),
    )
    run_model(model, batch, "GCPNetRS")


def test_cpd_model_direct_and_autoregressive():
    graphs = []
    for _ in range(2):
        n = 14
        g = random_graph(
            n, n * 4, 6, 3, 32, 1, mask=True,
            extras={"seq": RNG.integers(0, 20, size=n).astype(np.int32)},
        )
        graphs.append(g)
    batch = make_batch(graphs)
    mc = ModelCfg(
        chi_input_dim=2, e_input_dim=16, xi_input_dim=1,
        h_hidden_dim=32, chi_hidden_dim=8, e_hidden_dim=16, xi_hidden_dim=4,
        num_encoder_layers=2, num_decoder_layers=2, output_dim=20,
        decoder_residual_updates=True,
    )
    for ar in (False, True):
        model = GCPNetCPD(
            model_cfg=mc,
            module_cfg=ModuleCfg(),
            layer_cfg=_small_layer_cfg(),
            node_input_dims=(6, 3),
            edge_input_dims=(32, 1),
            autoregressive_decoder=ar,
        )
        run_model(model, batch, "GCPNetCPD")


@pytest.mark.heavy
def test_cpd_autoregressive_sampling():
    n = 10
    g = random_graph(
        n, n * 3, 6, 3, 32, 1,
        extras={"seq": RNG.integers(0, 20, size=n).astype(np.int32)},
    )
    num_samples = 3
    graphs = [g] * num_samples
    bucket = Bucket(
        num_nodes=n * num_samples, num_edges=g.num_edges * num_samples,
        num_graphs=num_samples,
    )
    batch = next(batches_from_dataset(graphs, bucket))
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    mc = ModelCfg(
        chi_input_dim=2, e_input_dim=16, xi_input_dim=1,
        h_hidden_dim=16, chi_hidden_dim=4, e_hidden_dim=16, xi_hidden_dim=4,
        num_encoder_layers=1, num_decoder_layers=2, output_dim=20,
    )
    model = GCPNetCPD(
        model_cfg=mc,
        module_cfg=ModuleCfg(),
        layer_cfg=_small_layer_cfg(),
        node_input_dims=(6, 3),
        edge_input_dims=(32, 1),
        autoregressive_decoder=True,
    )
    params = model.init(jax.random.key(0), batch, True)
    seq = model.apply(
        params, batch, jax.random.key(1), n,
        method=GCPNetCPD.sample,
    )
    seq = np.asarray(seq)
    assert seq.shape == (n * num_samples,)
    assert seq.min() >= 0 and seq.max() < 20


def test_eq_model():
    graphs = []
    num_res = 6
    for _ in range(2):
        n = num_res * 4
        res_idx = np.repeat(np.arange(num_res), 4).astype(np.int32)
        g = random_graph(
            n, n * 4, 9, 2, 18, 1,
            extras={
                "atom_types": RNG.integers(0, 38, size=n).astype(np.int32),
                "atom_residue_idx": res_idx,
                "label": RNG.random(num_res).astype(np.float32),
                "res_mask": np.ones(num_res, np.float32),
            },
        )
        graphs.append(g)
    batch = make_batch(graphs)
    from gcpnet_tpu.data.eq import _globalize_residues

    batch = _globalize_residues(batch, max_residues=16)
    model = GCPNetEQ(
        model_cfg=ModelCfg(
            h_input_dim=9, chi_input_dim=2, e_input_dim=18, xi_input_dim=1,
            h_hidden_dim=32, chi_hidden_dim=8, e_hidden_dim=16,
            xi_hidden_dim=4, num_encoder_layers=2,
        ),
        module_cfg=ModuleCfg(selected_gcp="GCP3"),
        layer_cfg=_small_layer_cfg(
            use_scalar_message_attention=True, aggregate_with_row=True,
            num_feedforward_layers=1,
        ),
    )
    run_model(model, batch, "GCPNetEQ")


def test_ar_model():
    graphs = []
    num_res = 5
    for _ in range(2):
        n = num_res * 4
        res_idx = np.repeat(np.arange(num_res), 4).astype(np.int32)
        g = random_graph(
            n, n * 6, 70, 2, 29, 1,
            extras={
                "label": RNG.normal(size=(n, 3)).astype(np.float32),
                "atom_residue_idx": res_idx,
                "ca_x_local": RNG.normal(size=(num_res, 3)).astype(np.float32),
                "num_atoms_per_residue": np.full(num_res, 4, np.int32),
            },
        )
        graphs.append(g)
    batch = make_batch(graphs)
    from gcpnet_tpu.data.ar import _globalize_ar_residues

    batch = _globalize_ar_residues(batch, max_residues=16)
    model = GCPNetAR(
        model_cfg=ModelCfg(
            h_input_dim=70, chi_input_dim=2, e_input_dim=29, xi_input_dim=1,
            h_hidden_dim=32, chi_hidden_dim=8, e_hidden_dim=16,
            xi_hidden_dim=4, num_encoder_layers=2, dropout=0.0,
        ),
        module_cfg=ModuleCfg(
            selected_gcp="GCP3", scalar_nonlinearity="silu",
            vector_nonlinearity="silu",
        ),
        layer_cfg=_small_layer_cfg(
            use_scalar_message_attention=True, aggregate_with_row=True,
            num_feedforward_layers=1,
        ),
    )
    run_model(model, batch, "GCPNetAR")


def test_nms_model():
    graphs = [
        random_graph(
            5, 20, 1, 3, 17, 1,
            extras={"label": RNG.normal(size=(5, 3)).astype(np.float32)},
        )
        for _ in range(2)
    ]
    batch = make_batch(graphs)
    model = GCPNetNMS(
        model_cfg=ModelCfg(
            h_input_dim=1, chi_input_dim=3, e_input_dim=17, xi_input_dim=1,
            h_hidden_dim=16, chi_hidden_dim=4, e_hidden_dim=8,
            xi_hidden_dim=4, num_encoder_layers=2,
        ),
        module_cfg=ModuleCfg(),
        layer_cfg=_small_layer_cfg(),
    )
    run_model(model, batch, "GCPNetNMS")
