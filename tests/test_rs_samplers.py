"""RS enantiomer-paired sampler semantics (reference rs_dataset.py:224-332)
and the real pickled-dataframe ingestion path (record format)."""

import numpy as np
import pytest

from gcpnet_tpu.data.rs import (
    NegativeBatchSampler,
    RSDataModule,
    SampleMapToNegatives,
    SampleMapToPositives,
    SingleConformerBatchSampler,
    synthetic_chiral_molecule,
)

# 2 molecules x 2 stereoisomers x {2,3} conformers
IDS = ["m1-R", "m1-R", "m1-S", "m1-S", "m1-S", "m2-R", "m2-R", "m2-S"]
SMILES = ["m1"] * 5 + ["m2"] * 3


def test_positive_map():
    pos = SampleMapToPositives(IDS)
    assert pos.mapping[0] == {1}
    assert pos.mapping[2] == {3, 4}
    pos_anchor = SampleMapToPositives(IDS, include_anchor=True)
    assert pos_anchor.mapping[0] == {0, 1}


def test_negative_map_is_stratified_by_stereoisomer():
    neg = SampleMapToNegatives(IDS, SMILES)
    # conformer 0 (m1-R): negatives are m1-S conformers only, one class
    assert neg.mapping[0] == [[2, 3, 4]]
    assert neg.mapping[7] == [[5, 6]]
    rng = np.random.default_rng(0)
    got = neg.sample(0, rng, N=2, stratified=True)
    assert set(got) <= {2, 3, 4} and len(got) == 2


def test_single_conformer_batch_sampler_groups():
    # anchors: first conformer of each stereoisomer
    anchors = [0, 2, 5, 7]
    sampler = SingleConformerBatchSampler(
        anchors, IDS, SMILES, batch_size=2, num_pos=0, num_neg=1, seed=0
    )
    assert len(sampler) == 2
    batches = list(sampler)
    assert len(batches) == 2
    for batch in batches:
        assert len(batch) == 4  # 2 groups x (1 anchor + 1 negative)
        # each group: anchor's stereoisomer then an opposite stereoisomer
        for a, n in zip(batch[::2], batch[1::2]):
            assert SMILES[a] == SMILES[n]
            assert IDS[a] != IDS[n]


def test_negative_batch_sampler_covers_all_conformers():
    sampler = NegativeBatchSampler(IDS, SMILES, batch_size=4, num_neg=1, seed=1)
    batches = list(sampler)
    assert len(batches) == 2
    anchors = [grp for b in batches for grp in b[::2]]
    assert sorted(anchors) == list(range(8))


def test_pickle_record_format_end_to_end(tmp_path):
    """The reference dataframe schema (ID / SMILES_nostereo /
    RS_label_binary + record) loads end-to-end and drives paired batches."""
    pd = pytest.importorskip("pandas")
    rng = np.random.default_rng(0)

    rows = []
    for p in range(4):
        g_r, g_s = synthetic_chiral_molecule(rng)
        for g, tag in ((g_r, "R"), (g_s, "S")):
            # build a record capturing the synthetic molecule's geometry
            n = g.x.shape[0]
            record = {
                "coords": g.x,
                "atoms": [
                    dict(symbol="C", degree=2, charge=0, num_hs=1,
                         hybridization="SP3", aromatic=False, mass=12.0,
                         global_tag=None, chiral_tag=0)
                    for _ in range(n)
                ],
                "bonds": [
                    dict(i=int(g.senders[e]), j=int(g.receivers[e]),
                         type="SINGLE", conjugated=False, in_ring=False,
                         stereo=0)
                    for e in range(0, g.senders.shape[0], 2)
                    if g.senders[e] < g.receivers[e]
                ],
            }
            rows.append(
                dict(ID=f"m{p}-{tag}", SMILES_nostereo=f"m{p}",
                     RS_label_binary=float(g.extras["label"]),
                     record=record)
            )
    df = pd.DataFrame(rows)
    pkl = tmp_path / "train.pkl"
    df.to_pickle(pkl)

    dm = RSDataModule(
        train_data_filepath=str(pkl),
        batch_size=2,
        num_neg=1,
        synthetic_sizes={"train": 4, "valid": 4, "test": 4},
    )
    dm.setup()
    assert len(dm.graphs["train"]) == 8  # loaded from the pickle
    assert len(dm.meta["train"]["single_idx"]) == 8  # 1 conformer per ID

    batch = next(iter(dm.train_batches()))
    labels = np.asarray(batch.extras["label"])[
        np.asarray(batch.graph_pad_mask)
    ]
    # paired batches alternate anchor/opposite-enantiomer labels
    assert set(np.unique(labels)) <= {0.0, 1.0}
    assert len(labels) >= 4
    for a, n in zip(labels[::2], labels[1::2]):
        assert a != n
