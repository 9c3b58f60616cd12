"""EQ pipeline end-to-end with a real (tiny) native ESM-2 checkpoint:
embeddings are non-zero, GCPNET_REQUIRE_ESM is honored, and a train step
runs — proving the no-zero-embeddings reporting path works without
fair-esm (VERDICT: the zero tier must never silently back a reported
run)."""

import os

import numpy as np
import pytest

EXAMPLES = "/root/reference/data/EQ/examples"

pytestmark = [
    pytest.mark.heavy,
    pytest.mark.skipif(
        not os.path.isdir(EXAMPLES),
        reason="reference EQ example data not present",
    ),
]


@pytest.fixture
def tiny_esm_checkpoint(tmp_path, monkeypatch):
    import jax

    from gcpnet_tpu.nn.esm import ESM2, ESM2Config, tokenize
    from gcpnet_tpu.utils.esm_convert import save_npz

    cfg = ESM2Config(num_layers=2, embed_dim=64, num_heads=4, vocab_size=33)
    params = ESM2(cfg).init(jax.random.key(0), tokenize("MKT")[None])
    params = jax.tree_util.tree_map(np.asarray, params)
    path = tmp_path / "esm_tiny.npz"
    save_npz(str(path), params, cfg)

    import gcpnet_tpu.data.esm as esm_mod

    monkeypatch.setenv("GCPNET_ESM_CHECKPOINT", str(path))
    monkeypatch.setenv("GCPNET_REQUIRE_ESM", "1")
    monkeypatch.setattr(esm_mod, "_jax_esm", None)
    yield str(path)
    monkeypatch.setattr(esm_mod, "_jax_esm", None)


def test_eq_trains_on_nonzero_esm_embeddings(tmp_path, tiny_esm_checkpoint):
    import jax
    import jax.numpy as jnp

    from gcpnet_tpu.config.schema import LayerCfg, ModelCfg, ModuleCfg, MPCfg
    from gcpnet_tpu.data.eq import EQDataModule
    from gcpnet_tpu.models import GCPNetEQ, eq_loss
    from gcpnet_tpu.parallel import make_mesh
    from gcpnet_tpu.train import Trainer

    splits = tmp_path / "splits"
    splits.mkdir()
    for fname in ("train.lst", "valid.lst", "test.lst"):
        (splits / fname).write_text("6W6VE\n")

    dm = EQDataModule(
        splits_dir=str(splits),
        decoy_dir=f"{EXAMPLES}/decoy_model",
        true_dir=f"{EXAMPLES}/true_model",
        model_data_cache_dir=str(tmp_path / "cache"),
        esm_cache_dir=str(tmp_path / "esm_cache"),
        batch_size=1,
        max_nodes_per_batch=2048,
        max_residues_per_batch=300,
    )
    dm.setup()
    batch = next(iter(dm.batches("train", shuffle=False)))

    # ESM block of the node scalars must be non-zero (64-dim tiny model)
    esm_block = np.asarray(batch.h)[np.asarray(batch.node_pad_mask), :64]
    assert np.abs(esm_block).sum() > 0, "ESM embeddings are zero"

    model = GCPNetEQ(
        model_cfg=ModelCfg(
            h_input_dim=65, chi_input_dim=2, e_input_dim=18, xi_input_dim=1,
            h_hidden_dim=16, chi_hidden_dim=4, e_hidden_dim=8, xi_hidden_dim=4,
            num_encoder_layers=1, dropout=0.0,
        ),
        module_cfg=ModuleCfg(selected_gcp="GCP3"),
        layer_cfg=LayerCfg(
            mp_cfg=MPCfg(num_message_layers=2), pre_norm=True,
            use_scalar_message_attention=True, aggregate_with_row=True,
        ),
    )
    tr = Trainer(
        model, eq_loss, optimizer_cfg={"_target_": "Adam", "lr": 1e-3},
        mesh=make_mesh(jax.devices()[:1]), early_stopping_patience=None,
    )
    dev = tr._put(batch)
    tr.init_state(dev)
    step = tr._build_train_step()
    _, loss, _ = step(tr.state, dev, jax.random.key(0), jnp.float32(1.0))
    assert np.isfinite(float(loss))


def test_require_esm_raises_without_source(monkeypatch):
    import gcpnet_tpu.data.esm as esm_mod

    monkeypatch.delenv("GCPNET_ESM_CHECKPOINT", raising=False)
    monkeypatch.setenv("GCPNET_REQUIRE_ESM", "1")
    monkeypatch.setattr(esm_mod, "_jax_esm", None)
    monkeypatch.setattr(esm_mod, "_esm_model", None)
    with pytest.raises(RuntimeError, match="GCPNET_REQUIRE_ESM"):
        esm_mod.embed_sequence("MKTAYIAK")
