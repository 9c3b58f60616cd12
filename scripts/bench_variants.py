#!/usr/bin/env python
"""Benchmark train-step variants on the flagship LBA shape:
fp32 vs bf16, scatter vs Pallas sorted-segment aggregation.

    python scripts/bench_variants.py
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

NODES = 448
EDGES = 28 * 448
GRAPHS = 16
WARMUP, STEPS = 3, 20


def build(sort_edges):
    from gcpnet_tpu.config.schema import LayerCfg, MPCfg, ModelCfg, ModuleCfg
    from gcpnet_tpu.data.batching import Bucket, collate_shards
    from gcpnet_tpu.graph import GraphData
    from gcpnet_tpu.models import GCPNetLBA

    rng = np.random.default_rng(0)

    def g():
        n, e = NODES, EDGES
        return GraphData(
            h=rng.integers(0, 9, size=n).astype(np.int32),
            chi=rng.normal(size=(n, 2, 3)).astype(np.float32),
            e=rng.normal(size=(e, 16)).astype(np.float32),
            xi=rng.normal(size=(e, 1, 3)).astype(np.float32),
            x=(rng.normal(size=(n, 3)) * 8).astype(np.float32),
            senders=rng.integers(0, n, size=e).astype(np.int32),
            receivers=rng.integers(0, n, size=e).astype(np.int32),
            extras={"label": np.float32(rng.normal())},
        )

    bucket = Bucket(NODES * GRAPHS, EDGES * GRAPHS, GRAPHS)
    batch = collate_shards(
        [[g() for _ in range(GRAPHS)]], bucket,
        extra_graph_keys=("label",), sort_edges=sort_edges,
    )
    model = GCPNetLBA(
        model_cfg=ModelCfg(
            chi_input_dim=2, e_input_dim=16, xi_input_dim=1,
            h_hidden_dim=100, chi_hidden_dim=16, e_hidden_dim=32,
            xi_hidden_dim=4, num_encoder_layers=8, dropout=0.1,
        ),
        module_cfg=ModuleCfg(),
        layer_cfg=LayerCfg(mp_cfg=MPCfg(num_message_layers=8)),
        num_atom_types=9,
    )
    return model, batch


def run(name, precision, sort_edges, use_pallas):
    import jax
    from gcpnet_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    import gcpnet_tpu.ops.segment as seg
    from gcpnet_tpu.models import graph_regression_loss
    from gcpnet_tpu.parallel import make_mesh
    from gcpnet_tpu.train import Trainer

    seg.USE_PALLAS_SEGMENT = use_pallas
    model, batch = build(sort_edges)
    trainer = Trainer(
        model, graph_regression_loss,
        optimizer_cfg={"_target_": "Adam", "lr": 1e-4},
        mesh=make_mesh(jax.devices()[:1]),
        early_stopping_patience=None,
        precision=precision,
    )
    dev = trainer._put(batch)
    trainer.init_state(dev)
    step = trainer._build_train_step()
    key = jax.random.key(0)
    one = jnp.float32(1.0)
    state = trainer.state
    t_compile = time.perf_counter()
    for _ in range(WARMUP):
        state, loss, gn = step(state, dev, key, one)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, loss, gn = step(state, dev, key, one)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    gps = STEPS * GRAPHS / dt
    print(json.dumps({
        "variant": name,
        "graphs_per_sec": round(gps, 1),
        "ms_per_step": round(1e3 * dt / STEPS, 3),
        "loss": float(loss),
        "warmup_s": round(t0 - t_compile, 1),
    }))
    return gps


def main():
    results = {}
    results["fp32"] = run("fp32", 32, False, False)
    results["fp32+sorted"] = run("fp32+sorted", 32, True, False)
    results["fp32+pallas"] = run("fp32+pallas", 32, True, True)
    best = max(results, key=results.get)
    print(json.dumps({"best": best, "graphs_per_sec": round(results[best], 1)}))


if __name__ == "__main__":
    main()
