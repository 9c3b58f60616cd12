"""CPD test-protocol utilities: per-chain perplexity + autoregressive
recovery with subset aggregation."""

import numpy as np
import pytest

import jax

from gcpnet_tpu.config.schema import LayerCfg, ModelCfg, ModuleCfg, MPCfg
from gcpnet_tpu.data.batching import Bucket, batches_from_dataset
from gcpnet_tpu.graph import GraphData
from gcpnet_tpu.models import GCPNetCPD
from gcpnet_tpu.models.cpd_eval import evaluate_cpd

pytestmark = pytest.mark.heavy  # compile-heavy integration tier


RNG = np.random.default_rng(9)


def _chain(n):
    return GraphData(
        h=RNG.normal(size=(n, 6)).astype(np.float32),
        chi=RNG.normal(size=(n, 3, 3)).astype(np.float32),
        e=RNG.normal(size=(n * 3, 32)).astype(np.float32),
        xi=RNG.normal(size=(n * 3, 1, 3)).astype(np.float32),
        x=RNG.normal(size=(n, 3)).astype(np.float32),
        senders=RNG.integers(0, n, size=n * 3).astype(np.int32),
        receivers=RNG.integers(0, n, size=n * 3).astype(np.int32),
        extras={"seq": RNG.integers(0, 20, size=n).astype(np.int32)},
    )


def test_evaluate_cpd_metrics():
    mc = ModelCfg(
        chi_input_dim=2, e_input_dim=16, xi_input_dim=1,
        h_hidden_dim=16, chi_hidden_dim=4, e_hidden_dim=16, xi_hidden_dim=4,
        num_encoder_layers=1, num_decoder_layers=1, output_dim=20,
    )
    model = GCPNetCPD(
        model_cfg=mc,
        module_cfg=ModuleCfg(),
        layer_cfg=LayerCfg(mp_cfg=MPCfg(num_message_layers=2)),
        node_input_dims=(6, 3),
        edge_input_dims=(32, 1),
        autoregressive_decoder=True,
    )
    chains = [("chainA", _chain(8)), ("chainB", _chain(10))]
    example = next(
        batches_from_dataset([chains[0][1]], Bucket(16, 48, 2), drop_last=False)
    )
    import jax.numpy as jnp

    dev = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a) if a is not None else None, example
    )
    params = model.init(jax.random.key(0), dev, True)["params"]

    metrics = evaluate_cpd(
        model,
        params,
        chains,
        custom_splits={"short": {"chainA"}},
        num_samples=2,
        max_nodes=32,
    )
    assert np.isfinite(metrics["test/all_perplexity"])
    assert 0.0 <= metrics["test/all_recovery"] <= 1.0
    assert "test/short_perplexity" in metrics
    # untrained model: perplexity near the uniform 20-way ceiling
    assert 5.0 < metrics["test/all_perplexity"] < 100.0