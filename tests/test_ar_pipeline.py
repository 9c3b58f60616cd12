"""AR pipeline integration on the reference's real example decoy
(/root/reference/data/AR/examples): featurization, model forward, stitched
refined-PDB output with native structure scoring."""

import os

import numpy as np
import pytest

EXAMPLES = "/root/reference/data/AR/examples"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(EXAMPLES), reason="reference AR example data not present"
)


def test_ar_featurize_real_decoy():
    from gcpnet_tpu.data.ar import featurize_refinement_pair

    g = featurize_refinement_pair(
        f"{EXAMPLES}/decoy_model/2CZOA.pdb",
        f"{EXAMPLES}/true_model/2CZOA.pdb",
        k_min=4, k_max=12,
    )
    assert g.h.shape[1] == 1338  # 21 res + 37 atom + 1280 ESM
    assert g.e.shape[1] == 29  # 12 pqkt + covalent + RBF16
    assert np.any(g.extras["label"] != g.x)  # native positions differ
    assert g.extras["ca_x_local"].shape[1] == 3


def test_ar_predict_pipeline(tmp_path):
    import jax
    import jax.numpy as jnp

    from gcpnet_tpu.config.schema import LayerCfg, ModelCfg, ModuleCfg, MPCfg
    from gcpnet_tpu.data.ar import ARDataModule
    from gcpnet_tpu.data.pdb import parse_pdb
    from gcpnet_tpu.models import GCPNetAR

    dm = ARDataModule(
        splits_dir="/root/reference/data/AR/splits",
        af2_dir=f"{EXAMPLES}/decoy_model",
        true_dir=f"{EXAMPLES}/true_model",
        k_min=4, k_max=12,
        predict_input_dir=f"{EXAMPLES}/decoy_model",
        predict_true_dir=f"{EXAMPLES}/true_model",
        predict_output_dir=str(tmp_path),
        max_nodes_per_batch=1200,
        max_residues_per_batch=200,
    )
    dm.prepare_data()
    dm.setup()

    model = GCPNetAR(
        model_cfg=ModelCfg(
            h_input_dim=1338, chi_input_dim=2, e_input_dim=29, xi_input_dim=1,
            h_hidden_dim=16, chi_hidden_dim=8, e_hidden_dim=8, xi_hidden_dim=4,
            num_encoder_layers=1, dropout=0.0,
        ),
        module_cfg=ModuleCfg(
            selected_gcp="GCP3", scalar_nonlinearity="silu",
            vector_nonlinearity="silu",
        ),
        layer_cfg=LayerCfg(
            mp_cfg=MPCfg(num_message_layers=2),
            use_scalar_message_attention=True, aggregate_with_row=True,
            num_feedforward_layers=1,
        ),
    )

    rows = []
    params = None
    for batch in dm.predict_batches():
        dev = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a) if a is not None else None, batch
        )
        if params is None:
            params = model.init(jax.random.key(0), dev, True)
        preds = np.asarray(model.apply(params, dev, True))
        rows.extend(dm.record_predictions(batch, preds, str(tmp_path)))

    assert len(rows) == 1
    row = rows[0]
    refined = parse_pdb(row["refined_pdb"], heavy_only=True)
    original = parse_pdb(f"{EXAMPLES}/decoy_model/2CZOA.pdb", heavy_only=True)
    assert len(refined.atoms) == len(original.atoms)
    # native scoring ran (untrained model => poor but finite scores)
    assert "TM-score" in row and 0.0 <= row["TM-score"] <= 1.0
    assert "lDDT" in row and 0.0 <= row["lDDT"] <= 1.0
