"""EQ pipeline integration on the reference's real example PDBs
(/root/reference/data/EQ/examples): featurization, batching, model forward,
and b-factor-annotated prediction output."""

import os

import numpy as np
import pytest

EXAMPLES = "/root/reference/data/EQ/examples"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(EXAMPLES), reason="reference EQ example data not present"
)


def test_featurize_real_decoy():
    from gcpnet_tpu.data.eq import featurize_decoy

    g = featurize_decoy(
        f"{EXAMPLES}/decoy_model/6W6VE.pdb",
        f"{EXAMPLES}/true_model/6W6VE.pdb",
    )
    assert g.h.shape[1] == 1281  # ESM 1280 + plDDT
    assert g.e.shape[1] == 18  # same-chain, same-residue, RBF16
    assert g.chi.shape[1:] == (2, 3)
    labels = g.extras["label"]
    assert labels.shape[0] == g.extras["atom_residue_idx"].max() + 1
    assert 0.0 < labels.mean() < 1.0  # real lDDT against the native


def test_eq_predict_pipeline(tmp_path):
    import jax

    from gcpnet_tpu.data.eq import EQDataModule
    from gcpnet_tpu.data.pdb import parse_pdb
    from gcpnet_tpu.config.schema import LayerCfg, ModelCfg, ModuleCfg, MPCfg
    from gcpnet_tpu.models import GCPNetEQ

    dm = EQDataModule(
        splits_dir="/root/reference/data/EQ/splits",
        decoy_dir=f"{EXAMPLES}/decoy_model",
        true_dir=f"{EXAMPLES}/true_model",
        model_data_cache_dir=str(tmp_path / "cache"),
        predict_input_dir=f"{EXAMPLES}/decoy_model",
        predict_true_dir=f"{EXAMPLES}/true_model",
        predict_output_dir=str(tmp_path / "out"),
        max_nodes_per_batch=2048,
        max_residues_per_batch=300,
    )
    dm.prepare_data()
    dm.setup()

    model = GCPNetEQ(
        model_cfg=ModelCfg(
            h_input_dim=1281, chi_input_dim=2, e_input_dim=18, xi_input_dim=1,
            h_hidden_dim=16, chi_hidden_dim=4, e_hidden_dim=8, xi_hidden_dim=4,
            num_encoder_layers=1,
        ),
        module_cfg=ModuleCfg(selected_gcp="GCP3"),
        layer_cfg=LayerCfg(
            mp_cfg=MPCfg(num_message_layers=2),
            use_scalar_message_attention=True,
            aggregate_with_row=True,
            num_feedforward_layers=1,
        ),
    )

    batches = list(dm.predict_batches())
    assert len(batches) == 2  # two example decoys
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir, exist_ok=True)
    params = None
    rows = []
    for batch in batches:
        import jax.numpy as jnp

        dev = jax.tree_util.tree_map(jnp.asarray, batch)
        if params is None:
            params = model.init(jax.random.key(0), dev, True)
        preds = np.asarray(model.apply(params, dev, True))
        rows.extend(dm.record_predictions(batch, preds, out_dir))

    assert len(rows) == 2
    for row in rows:
        assert os.path.exists(row["annotated_pdb"])
        s = parse_pdb(row["annotated_pdb"])
        assert len(s.atoms) > 0
        # annotated b-factors should hold the (untrained) model's plDDT preds
        bf = np.asarray([a.bfactor for a in s.atoms])
        assert np.isfinite(bf).all()
        assert 0.0 <= row["global_lddt_true"] <= 1.0
