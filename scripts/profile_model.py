#!/usr/bin/env python
"""Capture a jax.profiler trace of the flagship LBA train step.

    python scripts/profile_model.py --out /tmp/gcp_profile

View the trace with TensorBoard (`tensorboard --logdir <out>`) or upload
the .trace files to ui.perfetto.dev.  This is the round-2 entry point for
profile-driven kernel work.
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/gcp_profile")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--sorted", action="store_true",
                    help="use the receiver-sorted (Pallas) layout")
    args = ap.parse_args()

    import jax
    from gcpnet_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    from bench_variants import build  # noqa: the sibling script
    from gcpnet_tpu.models import graph_regression_loss
    from gcpnet_tpu.parallel import make_mesh
    from gcpnet_tpu.train import Trainer

    model, batch = build(args.sorted)
    trainer = Trainer(
        model, graph_regression_loss,
        optimizer_cfg={"_target_": "Adam", "lr": 1e-4},
        mesh=make_mesh(jax.devices()[:1]),
        early_stopping_patience=None,
    )
    dev = trainer._put(batch)
    trainer.init_state(dev)
    step = trainer._build_train_step()
    key = jax.random.key(0)
    one = jnp.float32(1.0)
    state = trainer.state
    for _ in range(3):
        state, loss, gn = step(state, dev, key, one)
    jax.block_until_ready(loss)

    jax.profiler.start_trace(args.out)
    for _ in range(args.steps):
        state, loss, gn = step(state, dev, key, one)
    jax.block_until_ready(loss)
    jax.profiler.stop_trace()
    print(f"trace written to {args.out}")


if __name__ == "__main__":
    main()
