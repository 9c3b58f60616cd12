"""Autoregressive CPD causality: the sequence embedding is injected only on
causal edges (sender < receiver), so node i's logits must be independent of
the residue identities at positions >= i."""

import jax
import jax.numpy as jnp
import numpy as np

from gcpnet_tpu.config.schema import LayerCfg, ModelCfg, ModuleCfg, MPCfg
from gcpnet_tpu.data.batching import Bucket, batches_from_dataset
from gcpnet_tpu.graph import GraphData
from gcpnet_tpu.models import GCPNetCPD

RNG = np.random.default_rng(13)


def test_autoregressive_decoder_is_causal():
    n = 10
    g = GraphData(
        h=RNG.normal(size=(n, 6)).astype(np.float32),
        chi=RNG.normal(size=(n, 3, 3)).astype(np.float32),
        e=RNG.normal(size=(n * 4, 32)).astype(np.float32),
        xi=RNG.normal(size=(n * 4, 1, 3)).astype(np.float32),
        x=RNG.normal(size=(n, 3)).astype(np.float32),
        senders=RNG.integers(0, n, size=n * 4).astype(np.int32),
        receivers=RNG.integers(0, n, size=n * 4).astype(np.int32),
        extras={"seq": RNG.integers(0, 20, size=n).astype(np.int32)},
    )
    batch = next(batches_from_dataset([g], Bucket(n, n * 4, 1)))
    batch = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a) if a is not None else None, batch
    )
    model = GCPNetCPD(
        model_cfg=ModelCfg(
            chi_input_dim=2, e_input_dim=16, xi_input_dim=1,
            h_hidden_dim=16, chi_hidden_dim=4, e_hidden_dim=16,
            xi_hidden_dim=4, num_encoder_layers=1, num_decoder_layers=2,
            output_dim=20,
        ),
        module_cfg=ModuleCfg(),
        layer_cfg=LayerCfg(mp_cfg=MPCfg(num_message_layers=2)),
        node_input_dims=(6, 3),
        edge_input_dims=(32, 1),
        autoregressive_decoder=True,
    )
    params = model.init(jax.random.key(0), batch, True)

    def logits_with_seq(seq):
        b = batch.replace_extras(seq=jnp.asarray(seq))
        out, _ = model.apply(params, b, True)
        return np.asarray(out)

    seq = np.asarray(batch.extras["seq"]).copy()

    # mutate residue 0: node 0's logits must not move; later nodes may
    seq_mut = seq.copy()
    seq_mut[0] = (seq[0] + 7) % 20
    l0 = logits_with_seq(seq)
    l1 = logits_with_seq(seq_mut)
    np.testing.assert_allclose(l1[0], l0[0], atol=1e-5)
    assert np.abs(l1[1:] - l0[1:]).max() > 1e-6, (
        "mutating residue 0 should influence downstream logits"
    )

    # mutate the LAST residue: no causal edge carries it -> nothing moves
    seq_mut = seq.copy()
    seq_mut[n - 1] = (seq[n - 1] + 3) % 20
    l2 = logits_with_seq(seq_mut)
    np.testing.assert_allclose(l2, l0, atol=1e-5)