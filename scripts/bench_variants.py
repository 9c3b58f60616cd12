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
K_SMALL, K_BIG = 5, 25


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
    trainer._build_train_step()
    local_step = trainer._local_step
    key = jax.random.key(0)
    one = jnp.float32(1.0)

    # honest timing: K steps inside one executable, fetch-synced, two loop
    # lengths differenced to cancel per-dispatch overhead (see bench.py)
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def k_steps(k):
        def local(state, b):
            def body(_, st):
                st, loss, gnorm = local_step(st, b, key, one)
                return st
            st = jax.lax.fori_loop(0, k - 1, body, state)
            st, loss, gnorm = local_step(st, b, key, one)
            return st, loss
        mapped = shard_map(local, mesh=trainer.mesh,
                           in_specs=(P(), P("dp")), out_specs=(P(), P()),
                           check_vma=False)
        return jax.jit(mapped, donate_argnums=(0,))

    run_small, run_big = k_steps(K_SMALL), k_steps(K_BIG)
    state = trainer.state
    state, loss = run_small(state, dev); float(loss)
    state, loss = run_big(state, dev); float(loss)

    def timed(fn):
        nonlocal state
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            state, loss_ = fn(state, dev)
            float(loss_)
            best = min(best, time.perf_counter() - t0)
        return best

    t_small = timed(run_small)
    t_big = timed(run_big)
    step_time = (t_big - t_small) / (K_BIG - K_SMALL)
    gps = GRAPHS / step_time
    print(json.dumps({
        "variant": name,
        "graphs_per_sec": round(gps, 1),
        "ms_per_step": round(step_time * 1e3, 3),
    }), flush=True)
    jax.clear_caches()
    return gps


def main():
    import sys as _sys
    which = _sys.argv[1:] or ["fp32", "bf16", "fp32+pallas", "bf16+pallas"]
    variants = {
        "fp32": (32, False, False),
        "bf16": (16, False, False),
        "fp32+sorted": (32, True, False),
        "fp32+pallas": (32, True, True),
        "bf16+pallas": (16, True, True),
    }
    results = {}
    for name in which:
        p, s, u = variants[name]
        results[name] = run(name, p, s, u)
    best = max(results, key=results.get)
    print(json.dumps({"best": best, "graphs_per_sec": round(results[best], 1)}))


if __name__ == "__main__":
    main()
