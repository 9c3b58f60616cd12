"""Data-layer tests: featurizers, batching, simulators, PDB IO, metrics."""

import numpy as np
import pytest

from gcpnet_tpu.data.batching import Bucket, batches_from_dataset, pack_by_budget
from gcpnet_tpu.data.features import normalize, orientations, rbf
from gcpnet_tpu.data.nms_sim import SimConfig, simulate_batch
from gcpnet_tpu.data.protein_graph import (
    dihedral_features,
    featurize_protein,
    knn_graph,
)
from gcpnet_tpu.data.rs import synthetic_chiral_molecule
from gcpnet_tpu.graph import GraphData
from gcpnet_tpu.utils.structure_metrics import (
    gdt_ts,
    kabsch,
    lddt,
    rmsd,
    tm_score,
)


def test_rbf_shape_and_peak():
    d = np.asarray([0.0, 2.25, 4.5])
    out = rbf(d, d_max=4.5, d_count=16)
    assert out.shape == (3, 16)
    assert np.argmax(out[0]) == 0 and np.argmax(out[2]) == 15


def test_normalize_zero_safe():
    out = normalize(np.zeros((3, 3)))
    assert np.isfinite(out).all()


def test_orientations_endpoints_zero():
    x = np.random.randn(5, 3).astype(np.float32)
    o = orientations(x)
    assert o.shape == (5, 2, 3)
    assert np.allclose(o[-1, 0], 0) and np.allclose(o[0, 1], 0)


def test_nms_simulator_conservation():
    """Charged-particle sim: no external field -> momentum drift stays tiny."""
    cfg = SimConfig.for_mode("small")
    rng = np.random.default_rng(0)
    loc, vel, edges, charges = simulate_batch(cfg, 4, rng, T=1000, sample_freq=100)
    assert loc.shape == (4, 9, 5, 3)
    p0 = vel[:, 0].sum(axis=1)
    p1 = vel[:, -1].sum(axis=1)
    # forces are pairwise equal-and-opposite except for the clamp
    assert np.abs(p1 - p0).max() < 0.2
    assert np.isfinite(loc).all()


@pytest.mark.parametrize("mode", ["small", "static", "dynamic", "springs"])
def test_nms_simulator_xla_matches_numpy(mode):
    """The XLA lax.scan integrator (the default backend that generates the
    headline NMS training data) must agree with the per-step numpy loop.

    Both backends draw identical initial conditions from the same seeded
    generator stream and run the same float64 leapfrog math in the same op
    order, so agreement is bitwise at short horizons (T=600; the dynamics
    are chaotic, so long horizons amplify any divergence — none allowed
    here).  Regression guard for data/nms_sim.py:73 vs the reference
    physics (synthetic_sim.py:10,153,306,466)."""
    cfg = SimConfig.for_mode(mode)
    out = {}
    for backend in ("numpy", "xla"):
        rng = np.random.default_rng(7)
        out[backend] = simulate_batch(
            cfg, 2, rng, T=600, sample_freq=100, backend=backend
        )
    for a, b, name in zip(
        out["numpy"], out["xla"], ("loc", "vel", "edges", "charges")
    ):
        np.testing.assert_array_equal(a, b, err_msg=f"{mode}:{name}")


def test_knn_graph_masked_nodes_have_no_edges():
    x = np.random.randn(10, 3)
    valid = np.ones(10, bool)
    valid[3] = False
    s, r = knn_graph(np.where(valid[:, None], x, np.inf), 4, valid=valid)
    assert not np.any(r == 3) and not np.any(s == 3)
    assert np.all(np.bincount(r, minlength=10)[valid] == 4)


def test_dihedral_features_shape():
    coords = np.random.randn(7, 4, 3).astype(np.float32)
    d = dihedral_features(coords)
    assert d.shape == (7, 6)
    assert np.all(np.abs(d) <= 1 + 1e-6)


def test_featurize_protein_dims():
    rng = np.random.default_rng(0)
    n = 12
    coords = rng.normal(size=(n, 4, 3)).astype(np.float32) * 3
    coords[5] = np.nan  # a residue with missing coordinates
    protein = {"seq": "ACDEFGHIKLMN"[:n], "coords": coords, "name": "t"}
    g = featurize_protein(protein, top_k=4)
    assert g.h.shape == (n, 6)
    assert g.chi.shape == (n, 3, 3)
    assert g.e.shape[1] == 32  # 16 rbf + 16 positional
    assert g.node_mask is not None and not g.node_mask[5]
    assert np.isfinite(g.h).all() and np.isfinite(g.e).all()


def test_pack_by_budget_reference_semantics():
    sizes = [(10, 100), (10, 200), (10, 300), (10, 1000)]
    batches = pack_by_budget(sizes, max_units=450, unit="edge")
    # graph 3 (1000 edges) dropped; [100, 200] fit, [300] next
    assert batches == [[0, 1], [2]]


def test_batches_from_dataset_shard_local_indices():
    rng = np.random.default_rng(0)

    def mk(n):
        return GraphData(
            h=rng.normal(size=(n, 4)).astype(np.float32),
            chi=rng.normal(size=(n, 2, 3)).astype(np.float32),
            e=rng.normal(size=(n * 2, 3)).astype(np.float32),
            xi=rng.normal(size=(n * 2, 1, 3)).astype(np.float32),
            x=rng.normal(size=(n, 3)).astype(np.float32),
            senders=rng.integers(0, n, size=n * 2).astype(np.int32),
            receivers=rng.integers(0, n, size=n * 2).astype(np.int32),
            extras={"label": np.float32(1.0)},
        )

    graphs = [mk(8) for _ in range(8)]
    bucket = Bucket(num_nodes=20, num_edges=40, num_graphs=2)
    batches = list(
        batches_from_dataset(
            graphs, bucket, num_shards=2, extra_graph_keys=("label",)
        )
    )
    assert len(batches) >= 1
    b = batches[0]
    assert b.x.shape[0] == 40  # 2 shards * 20
    # indices in the second shard must be local (< 20)
    assert b.senders.max() < 20


def test_synthetic_chirality_pair_labels_differ():
    rng = np.random.default_rng(0)
    g_r, g_s = synthetic_chiral_molecule(rng)
    assert g_r.extras["label"] != g_s.extras["label"]
    # mirrored geometry
    assert np.allclose(g_r.x[:, 1:], g_s.x[:, 1:], atol=1e-6)
    assert np.allclose(g_r.x[:, 0], -g_s.x[:, 0], atol=1e-6)


class TestStructureMetrics:
    def test_kabsch_recovers_rotation(self, rng):
        from conftest import random_rotation

        x = rng.normal(size=(30, 3))
        q = random_rotation(rng)
        y = x @ q.T + np.array([1.0, 2.0, 3.0])
        assert rmsd(x, y) < 1e-6
        assert tm_score(x, y) > 0.999
        assert gdt_ts(x, y) > 0.999

    def test_lddt_identical_is_one(self, rng):
        x = rng.normal(size=(20, 3)) * 5
        res = np.arange(20)
        assert lddt(x, x, residue_index=res) == pytest.approx(1.0)

    def test_lddt_perturbed_decreases(self, rng):
        x = rng.normal(size=(20, 3)) * 5
        y = x + rng.normal(size=(20, 3)) * 2.0
        res = np.arange(20)
        v = lddt(y, x, residue_index=res)
        assert 0.0 < v < 1.0

    def test_per_residue_lddt_shape(self, rng):
        x = rng.normal(size=(24, 3)) * 5
        res = np.repeat(np.arange(6), 4)
        scores = lddt(x, x, residue_index=res, per_residue=True)
        assert scores.shape == (6,)
        np.testing.assert_allclose(scores, 1.0)


def test_pdb_roundtrip(tmp_path, rng):
    from gcpnet_tpu.data.pdb import parse_pdb, write_pdb

    n = 10
    coords = rng.normal(size=(n, 3)) * 10
    path = str(tmp_path / "test.pdb")
    write_pdb(
        path,
        coords,
        atom_names=["CA"] * n,
        resnames=["ALA"] * n,
        chains=["A"] * n,
        resseqs=list(range(1, n + 1)),
        bfactors=np.linspace(0, 1, n),
    )
    s = parse_pdb(path)
    assert len(s.atoms) == n
    np.testing.assert_allclose(s.coords, coords, atol=1e-3)
    assert s.atoms[0].resname == "ALA"
    np.testing.assert_allclose(
        [a.bfactor for a in s.atoms], np.linspace(0, 1, n), atol=1e-2
    )
