#!/usr/bin/env python
"""Weak-scaling check over a virtual device mesh: fixed per-device batch,
1/2/4/8 devices, one fetch-synced scan of train steps per measurement.

On real multi-chip hardware this measures ICI gradient-psum scaling; on a
single host it validates that the sharded program compiles/executes at
every mesh size and exposes the collective + partitioning overhead (all
virtual devices share one physical core, so absolute times are not
hardware-representative — flat-ish per-device work growth is the signal).

    python scripts/weak_scaling.py            # 1 2 4 8
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

NODES, EDGES, GRAPHS_PER_DEVICE = 64, 512, 4
K_STEPS = 8


def measure(n_devices: int) -> float:
    import jax

    from gcpnet_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from gcpnet_tpu.config.schema import LayerCfg, MPCfg, ModelCfg, ModuleCfg
    from gcpnet_tpu.data.batching import Bucket, collate_shards
    from gcpnet_tpu.graph import GraphData
    from gcpnet_tpu.models import GCPNetLBA, graph_regression_loss
    from gcpnet_tpu.parallel import make_mesh
    from gcpnet_tpu.train import Trainer

    rng = np.random.default_rng(0)

    def g():
        return GraphData(
            h=rng.integers(0, 9, size=NODES).astype(np.int32),
            chi=rng.normal(size=(NODES, 2, 3)).astype(np.float32),
            e=rng.normal(size=(EDGES, 16)).astype(np.float32),
            xi=rng.normal(size=(EDGES, 1, 3)).astype(np.float32),
            x=(rng.normal(size=(NODES, 3)) * 4).astype(np.float32),
            senders=rng.integers(0, NODES, size=EDGES).astype(np.int32),
            receivers=rng.integers(0, NODES, size=EDGES).astype(np.int32),
            extras={"label": np.float32(rng.normal())},
        )

    bucket = Bucket(
        num_nodes=NODES * GRAPHS_PER_DEVICE + 8,
        num_edges=EDGES * GRAPHS_PER_DEVICE + 8,
        num_graphs=GRAPHS_PER_DEVICE + 1,
    )
    shards = [
        [g() for _ in range(GRAPHS_PER_DEVICE)] for _ in range(n_devices)
    ]
    batch = collate_shards(shards, bucket, extra_graph_keys=("label",))

    model = GCPNetLBA(
        model_cfg=ModelCfg(
            chi_input_dim=2, e_input_dim=16, xi_input_dim=1,
            h_hidden_dim=32, chi_hidden_dim=8, e_hidden_dim=16,
            xi_hidden_dim=4, num_encoder_layers=2, dropout=0.0,
        ),
        module_cfg=ModuleCfg(),
        layer_cfg=LayerCfg(mp_cfg=MPCfg(num_message_layers=2)),
        num_atom_types=9,
    )
    trainer = Trainer(
        model, graph_regression_loss,
        optimizer_cfg={"_target_": "Adam", "lr": 1e-4},
        mesh=make_mesh(jax.devices()[:n_devices]),
        early_stopping_patience=None,
    )
    dev = trainer._put(batch)
    trainer.init_state(dev)
    trainer._build_train_step()
    local_step = trainer._local_step
    key = jax.random.key(0)
    one = jnp.float32(1.0)

    def local(state, b):
        def body(_, st):
            st, loss, gn = local_step(st, b, key, one)
            return st

        st = jax.lax.fori_loop(0, K_STEPS - 1, body, state)
        st, loss, gn = local_step(st, b, key, one)
        return st, loss

    mapped = shard_map(
        local, mesh=trainer.mesh, in_specs=(P(), P("dp")),
        out_specs=(P(), P()), check_vma=False,
    )
    run = jax.jit(mapped, donate_argnums=(0,))

    state, loss = run(trainer.state, dev)
    float(loss)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state, loss = run(state, dev)
        float(loss)
        best = min(best, time.perf_counter() - t0)
    return best / K_STEPS


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    rows = []
    for n in (1, 2, 4, 8):
        if n > len(jax.devices()):
            break
        dt = measure(n)
        rows.append({"devices": n, "ms_per_step": round(dt * 1e3, 2),
                     "graphs_per_step": n * GRAPHS_PER_DEVICE})
        print(json.dumps(rows[-1]), flush=True)
    base = rows[0]["ms_per_step"]
    print(json.dumps({
        "metric": "weak_scaling",
        "efficiency_8dev": round(base / rows[-1]["ms_per_step"], 3)
        if len(rows) == 4 else None,
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
