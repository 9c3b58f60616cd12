"""Numerical parity of the flax ESM-2 against the HuggingFace reference
implementation (random weights, tiny config) — validates the architecture
so that real fair-esm/HF checkpoints load correctly.  Marked slow: imports
transformers+torch."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

transformers = pytest.importorskip("transformers")


def test_esm2_matches_hf_reference():
    import torch
    from transformers.models.esm import configuration_esm, modeling_esm

    from gcpnet_tpu.nn.esm import ESM2, PAD_ID, tokenize
    from gcpnet_tpu.utils.esm_convert import from_hf_state_dict

    torch.manual_seed(0)
    hf_cfg = configuration_esm.EsmConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=256, vocab_size=33,
        position_embedding_type="rotary", token_dropout=True,
        mask_token_id=32, pad_token_id=PAD_ID, emb_layer_norm_before=False,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-5,  # fair-esm's value (HF default 1e-12 differs)
    )
    hf = modeling_esm.EsmModel(hf_cfg, add_pooling_layer=False)
    hf.eval()

    seqs = ["MKTAYIAKQR", "GAVLIFW"]
    max_len = max(len(s) for s in seqs) + 2
    toks = np.full((len(seqs), max_len), PAD_ID, dtype=np.int64)
    for i, s in enumerate(seqs):
        t = tokenize(s)
        toks[i, : len(t)] = t
    attn = (toks != PAD_ID).astype(np.int64)

    with torch.no_grad():
        ref = hf(
            input_ids=torch.from_numpy(toks),
            attention_mask=torch.from_numpy(attn),
        ).last_hidden_state.numpy()

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params, cfg = from_hf_state_dict(sd, num_heads=4)
    mine = np.asarray(ESM2(cfg).apply(params, np.asarray(toks)))

    valid = attn.astype(bool)
    np.testing.assert_allclose(
        mine[valid], ref[valid], atol=2e-4, rtol=2e-4
    )
