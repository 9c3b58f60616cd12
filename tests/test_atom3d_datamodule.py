"""ATOM3D datamodule tests (npz record backend) — the analog of
tests/test_atom3d_datamodule.py in the reference, using synthetic records
since the LMDB archives require network access."""

import os

import numpy as np
import pytest

from gcpnet_tpu.data.atom3d import ATOM3DDataModule

pytestmark = pytest.mark.heavy  # compile-heavy integration tier


ELEMENTS = np.asarray(["C", "N", "O", "S", "H"])


def _write_records(root, task, n_records=6):
    sub = (
        "LBA/split-by-sequence-identity-30/data"
        if task == "LBA"
        else "PSR/split-by-year/data"
    )
    rng = np.random.default_rng(0)
    for split in ("train", "val", "test"):
        out = os.path.join(root, sub, split + "_npz")
        os.makedirs(out, exist_ok=True)
        for i in range(n_records):
            n = int(rng.integers(16, 32))
            rec = dict(
                coords=(rng.normal(size=(n, 3)) * 4).astype(np.float32),
                elements=rng.choice(ELEMENTS, size=n),
                label=np.float32(rng.normal()),
            )
            if task == "LBA":
                flag = np.zeros(n, np.int32)
                flag[-4:] = 1
                rec["lig_flag"] = flag
            else:
                rec["target"] = f"T{i % 2}"
            np.savez_compressed(os.path.join(out, f"{i:03d}.npz"), **rec)


@pytest.mark.parametrize("task", ["LBA", "PSR"])
def test_atom3d_npz_pipeline(tmp_path, task):
    _write_records(str(tmp_path), task)
    dm = ATOM3DDataModule(
        task=task,
        data_dir=str(tmp_path),
        batch_size=3,
        max_nodes_per_batch=256,
    )
    dm.prepare_data()
    dm.setup()
    assert len(dm.datasets["train"]) == 6

    batches = list(dm.test_batches())
    assert batches, "no test batches produced"
    b = batches[0]
    assert b.h.dtype in (np.int32, np.int64)  # atom-type indices
    assert b.e.shape[1] == 16  # RBF16
    assert b.chi.shape[1:] == (2, 3)
    # production default (node-budget mode) is the DENSE fixed-degree
    # slot-major layout — measured fastest on v5e (data/batching.py
    # DENSE_EDGES_DEFAULT); sorted Pallas stays available via the flag
    assert b.edge_row_splits is None
    assert b.edge_dense_degree == dm.max_neighbors
    N, K = b.num_nodes, b.edge_dense_degree
    assert b.num_edges == N * K
    assert (
        np.asarray(b.receivers).reshape(K, N) == np.arange(N)[None, :]
    ).all()
    from gcpnet_tpu.data import batching as batching_mod

    old_sort = batching_mod.SORT_EDGES_DEFAULT
    old_dense = batching_mod.DENSE_EDGES_DEFAULT
    batching_mod.SORT_EDGES_DEFAULT = True
    batching_mod.DENSE_EDGES_DEFAULT = False
    try:
        b_sorted = next(iter(dm.test_batches()))
        assert b_sorted.edge_row_splits is not None
        assert b_sorted.edge_dense_degree is None
    finally:
        batching_mod.SORT_EDGES_DEFAULT = old_sort
        batching_mod.DENSE_EDGES_DEFAULT = old_dense
    if task == "LBA":
        assert "lig_flag" in b.extras
    else:
        assert "target_id" in b.extras
    assert np.isfinite(np.asarray(b.e)).all()


def test_lba_training_step(tmp_path):
    """One real optimization step through the ATOM3D LBA pipeline."""
    import jax

    from gcpnet_tpu.config.schema import LayerCfg, ModelCfg, ModuleCfg, MPCfg
    from gcpnet_tpu.models import GCPNetLBA, graph_regression_loss
    from gcpnet_tpu.parallel import make_mesh
    from gcpnet_tpu.train import Trainer

    _write_records(str(tmp_path), "LBA")
    dm = ATOM3DDataModule(
        task="LBA", data_dir=str(tmp_path), batch_size=3,
        max_nodes_per_batch=256,
    )
    dm.prepare_data()
    dm.setup()
    model = GCPNetLBA(
        model_cfg=ModelCfg(
            chi_input_dim=2, e_input_dim=16, xi_input_dim=1,
            h_hidden_dim=16, chi_hidden_dim=4, e_hidden_dim=8,
            xi_hidden_dim=4, num_encoder_layers=1,
        ),
        module_cfg=ModuleCfg(),
        layer_cfg=LayerCfg(mp_cfg=MPCfg(num_message_layers=2)),
        num_atom_types=9,
    )
    from gcpnet_tpu.tasks import build_collect, build_metric_fns

    tr = Trainer(
        model, graph_regression_loss,
        optimizer_cfg={"_target_": "Adam", "lr": 1e-3},
        max_epochs=1,
        mesh=make_mesh(jax.devices()[:1]),
        early_stopping_patience=None,
        collect_fn=build_collect("GCPNetLBA"),
        metric_fns=build_metric_fns("GCPNetLBA"),
    )
    metrics = tr.fit(dm)
    assert np.isfinite(metrics["val/loss"])
    assert "val/RMSE" in metrics and "val/PearsonCorrCoef" in metrics