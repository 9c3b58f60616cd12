#!/usr/bin/env python
"""Benchmark CPD autoregressive sequence sampling on chip (seqs/sec).

The reference's recovery protocol samples 100 sequences per test chain
with a Python loop over residues x samples on GPU
(/root/reference/src/models/gcpnet_cpd_module.py:276-363) — its slowest
eval path.  Here the 100 samples are ONE batch (100 tiled copies of the
chain) and the residue loop is a single on-device ``lax.fori_loop``
(models/cpd.py sample), so each loop step advances all 100 samples at
once and the whole recovery measurement for a chain is one dispatch.

Shape: a CATH-like chain (top_k=30 kNN edges, node features (6,3),
edge features (32,1) — data/cath.py featurizer) at the production CPD
model size (9 encoder + 3 decoder layers, hidden 100/16/32/4 —
configs/model/model_cfg/gcp_model_cpd.yaml).

    python scripts/bench_cpd_sample.py                 # n=128 residues
    BENCH_CPD_RES=256 BENCH_CPD_SAMPLES=100 python scripts/bench_cpd_sample.py

Prints one JSON line with seqs/sec, residues/sec and ms per sampled
sequence.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

NUM_RES = int(os.environ.get("BENCH_CPD_RES", "128"))
NUM_SAMPLES = int(os.environ.get("BENCH_CPD_SAMPLES", "100"))
TOP_K = 30  # data/cath.py kNN featurizer default
REPEATS = 5


def _chain(rng, n):
    """CATH-shaped chain: kNN graph over a random walk (spatially local,
    in-degree exactly TOP_K like the featurizer's kNN)."""
    from gcpnet_tpu.graph import GraphData

    x = np.cumsum(rng.normal(size=(n, 3)).astype(np.float32) * 1.5, axis=0)
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    nbr = np.argsort(d2, axis=1)[:, :TOP_K]
    receivers = np.repeat(np.arange(n, dtype=np.int32), TOP_K)
    senders = nbr.astype(np.int32).reshape(-1)
    e = n * TOP_K
    return GraphData(
        h=rng.normal(size=(n, 6)).astype(np.float32),
        chi=rng.normal(size=(n, 3, 3)).astype(np.float32),
        e=rng.normal(size=(e, 32)).astype(np.float32),
        xi=rng.normal(size=(e, 1, 3)).astype(np.float32),
        x=x,
        senders=senders,
        receivers=receivers,
        extras={"seq": rng.integers(0, 20, size=n).astype(np.int32)},
    )


def main():
    import jax
    import jax.numpy as jnp

    from gcpnet_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    from gcpnet_tpu.config.schema import LayerCfg, MPCfg, ModelCfg, ModuleCfg
    from gcpnet_tpu.data.batching import Bucket, batches_from_dataset
    from gcpnet_tpu.models import GCPNetCPD

    rng = np.random.default_rng(0)
    graph = _chain(rng, NUM_RES)

    model = GCPNetCPD(
        model_cfg=ModelCfg(
            chi_input_dim=2, e_input_dim=16, xi_input_dim=1,
            h_hidden_dim=100, chi_hidden_dim=16,
            e_hidden_dim=32, xi_hidden_dim=4,
            output_dim=20, num_encoder_layers=9, num_decoder_layers=3,
            dropout=0.2, decoder_residual_updates=True,
        ),
        module_cfg=ModuleCfg(),
        layer_cfg=LayerCfg(mp_cfg=MPCfg(num_message_layers=8)),
        node_input_dims=(6, 3),
        edge_input_dims=(32, 1),
        autoregressive_decoder=True,
    )

    # one batch = NUM_SAMPLES tiled copies of the chain (the reference's
    # ``repeat``); graph slots are equal-sized so local node index ==
    # sequence position, which sample() requires
    bucket = Bucket(
        num_nodes=NUM_RES * NUM_SAMPLES,
        num_edges=NUM_RES * TOP_K * NUM_SAMPLES,
        num_graphs=NUM_SAMPLES,
    )
    batch = next(
        batches_from_dataset([graph] * NUM_SAMPLES, bucket, drop_last=False)
    )
    dev = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a) if a is not None else None, batch
    )
    params = model.init(jax.random.key(0), dev, True)["params"]

    @jax.jit
    def sample(params, batch, rng_key):
        return model.apply(
            {"params": params}, batch, rng_key, NUM_RES,
            method=type(model).sample,
        )

    key = jax.random.key(1)
    out = sample(params, dev, key)
    np.asarray(out)  # compile + warm (hard sync)

    best = float("inf")
    for i in range(REPEATS):
        k = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        np.asarray(sample(params, dev, k))
        best = min(best, time.perf_counter() - t0)

    seqs_per_sec = NUM_SAMPLES / best
    print(json.dumps({
        "metric": "cpd_sample_throughput",
        "value": round(seqs_per_sec, 2),
        "unit": "seqs/sec/chip",
        "num_residues": NUM_RES,
        "num_samples": NUM_SAMPLES,
        "residues_per_sec": round(seqs_per_sec * NUM_RES, 1),
        "ms_per_recovery_eval": round(best * 1e3, 1),
        "device_kind": getattr(jax.devices()[0], "device_kind", "?"),
    }))


if __name__ == "__main__":
    main()
