#!/usr/bin/env python
"""Benchmark an EQ-shaped train step: scatter vs sender-dense layouts.

The EQ/AR trunk aggregates messages keyed by SENDERS (the reference's
``aggregate_with_row: true``, configs/model/layer_cfg/
gcp_interaction_layer_eq.yaml:5-6) — round 3's receiver-dense layout did
not apply there (VERDICT r3 weak #3).  This measures the round-4
sender-dense path end-to-end on a realistic EQ shape (all-atom decoys,
radius graph r=4.5 capped at 32 in-neighbors, ESM-width node scalars,
5 GCPInteractions2 layers — configs/model/model_cfg/gcp_model_eq.yaml):

  * ``plain``  — edge-list layout, XLA scatter aggregation (round-3 EQ)
  * ``dense``  — receiver-dense re-lay + sender perm + inverse perm
                 (the round-4 EQ production layout)
  * ``attach`` — original edge order + sender perm only (the round-4 AR
                 production layout; receiver side keeps the scatter)

Timing protocol identical to bench.py: K steps inside one fori_loop
executable, loss fetched (hard sync), two loop lengths differenced to
cancel dispatch overhead.

    python scripts/bench_eq_step.py            # all three variants
    BENCH_EQ_VARIANT=dense python scripts/bench_eq_step.py
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

NODES = 2048            # ~256-residue all-atom decoy
GRAPHS = 4
ESM_DIM = 1280
IN_DEG_CAP = 32         # featurize_decoy max_neighbors (data/eq.py)
# out-degree budget (overridable: padding slots cost HBM bandwidth
# linearly, so budget sensitivity decides whether the sender-dense
# layout can win at all)
DENSE_OUT = int(os.environ.get("BENCH_EQ_OUT", "64"))
ATOMS_PER_RES = 8
K_SMALL, K_BIG = 5, 25
REPEATS = 3


def _graph(rng):
    """EQ-shaped graph with radius-graph-like degree structure."""
    from gcpnet_tpu.graph import GraphData

    n = NODES
    in_deg = rng.integers(24, IN_DEG_CAP + 1, size=n)
    e = int(in_deg.sum())
    receivers = np.repeat(np.arange(n, dtype=np.int32), in_deg)
    # senders drawn locally (radius graphs are spatially local, so
    # out-degree concentrates like in-degree); ring wrap — clipping to
    # [0, n) would pile every clipped edge onto nodes 0 / n-1 and blow
    # the sender-dense out-degree budget
    senders = (
        (receivers + rng.integers(-40, 41, size=e)) % n
    ).astype(np.int32)
    num_res = n // ATOMS_PER_RES
    return GraphData(
        h=rng.normal(size=(n, ESM_DIM + 1)).astype(np.float32),
        chi=rng.normal(size=(n, 2, 3)).astype(np.float32),
        e=rng.normal(size=(e, 18)).astype(np.float32),
        xi=rng.normal(size=(e, 1, 3)).astype(np.float32),
        x=(rng.normal(size=(n, 3)) * 8).astype(np.float32),
        senders=senders,
        receivers=receivers,
        extras={
            "atom_types": rng.integers(0, 38, size=n).astype(np.int32),
            "atom_residue_idx": (
                np.arange(n, dtype=np.int32) // ATOMS_PER_RES
            ),
            "label": rng.random(num_res).astype(np.float32),
            "res_mask": np.ones(num_res, np.float32),
        },
    )


def build(variant):
    import jax

    from gcpnet_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    from gcpnet_tpu.config.schema import LayerCfg, MPCfg, ModelCfg, ModuleCfg
    from gcpnet_tpu.data.batching import Bucket, collate_shards
    from gcpnet_tpu.data.eq import _globalize_residues
    from gcpnet_tpu.models import GCPNetEQ
    from gcpnet_tpu.models.eq import eq_loss
    from gcpnet_tpu.parallel import make_mesh
    from gcpnet_tpu.train import Trainer

    rng = np.random.default_rng(0)
    graphs = [_graph(rng) for _ in range(GRAPHS)]
    bucket = Bucket(
        num_nodes=NODES * GRAPHS,
        num_edges=NODES * IN_DEG_CAP * GRAPHS,
        num_graphs=GRAPHS,
    )
    batch = collate_shards(
        [graphs],
        bucket,
        dense_degree=IN_DEG_CAP if variant == "dense" else None,
        dense_out_degree=(
            DENSE_OUT if variant in ("dense", "attach") else None
        ),
    )
    max_res = (NODES // ATOMS_PER_RES) * GRAPHS
    batch = _globalize_residues(batch, max_res)

    model = GCPNetEQ(
        model_cfg=ModelCfg(
            h_input_dim=ESM_DIM + 1, chi_input_dim=2,
            e_input_dim=18, xi_input_dim=1,
            h_hidden_dim=100, chi_hidden_dim=16,
            e_hidden_dim=32, xi_hidden_dim=4,
            output_dim=1, output_scale_factor=2,
            num_encoder_layers=5, dropout=0.1, dense_dropout=0.1,
        ),
        module_cfg=ModuleCfg(
            selected_gcp="GCP3", vector_gate=True, bottleneck=4,
        ),
        layer_cfg=LayerCfg(
            pre_norm=False, use_scalar_message_attention=True,
            aggregate_with_row=True, num_feedforward_layers=1,
            dropout=0.1, mp_cfg=MPCfg(num_message_layers=4),
        ),
        num_residues=max_res,
    )
    mesh = make_mesh(jax.devices()[:1])
    trainer = Trainer(
        model, eq_loss,
        optimizer_cfg={"_target_": "Adam", "lr": 1e-4},
        mesh=mesh, early_stopping_patience=None, precision=16,
    )
    dev_batch = trainer._put(batch)
    trainer.init_state(dev_batch)
    return trainer, dev_batch


def run_variant(variant):
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    trainer, dev_batch = build(variant)
    key = jax.random.key(0)
    one = jnp.float32(1.0)
    trainer._build_train_step()
    local_step = trainer._local_step

    def local(state, b, k):
        def body(_, st):
            st, loss, gnorm = local_step(st, b, key, one)
            return st

        st = jax.lax.fori_loop(0, k, body, state)
        st, loss, gnorm = local_step(st, b, key, one)
        return st, loss

    run_k = jax.jit(
        shard_map(
            local, mesh=trainer.mesh,
            in_specs=(P(), P("dp"), P()), out_specs=(P(), P()),
            check_vma=False,
        ),
        donate_argnums=(0,),
    )
    k_small, k_big = jnp.int32(K_SMALL - 1), jnp.int32(K_BIG - 1)
    state = trainer.state
    state, loss = run_k(state, dev_batch, k_small)
    float(loss)
    state, loss = run_k(state, dev_batch, k_big)
    float(loss)

    def timed(k):
        nonlocal state
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            state, loss = run_k(state, dev_batch, k)
            float(loss)
            best = min(best, time.perf_counter() - t0)
        return best

    t_small, t_big = timed(k_small), timed(k_big)
    step = (t_big - t_small) / (K_BIG - K_SMALL)
    return {
        "variant": variant,
        "ms_per_step": round(step * 1e3, 2),
        "graphs_per_sec": round(GRAPHS / step, 2),
        "nodes": NODES, "graphs": GRAPHS,
    }


def main():
    variant = os.environ.get("BENCH_EQ_VARIANT", "")
    if variant:
        print(json.dumps(run_variant(variant)))
        return
    # one subprocess per variant (a second jitted trainer in-process
    # measures slower — RESULTS.md operational notes)
    import subprocess

    for v in ("plain", "attach", "dense"):
        env = dict(os.environ, BENCH_EQ_VARIANT=v)
        subprocess.run([sys.executable, __file__], env=env, check=False)


if __name__ == "__main__":
    main()
