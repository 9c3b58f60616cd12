#!/usr/bin/env python
"""Capture a jax.profiler trace of the flagship LBA train step.

    python scripts/profile_model.py --out /tmp/gcp_profile --variant dense

Reuses bench.py's variant builder so the profiled program is EXACTLY the
benched one (same layout, precision policy, and trainer step).  Analyze
with ``python scripts/analyze_profile.py <out>`` (no tensorboard needed)
or upload the .trace files to ui.perfetto.dev.  This is the round-2/3
entry point for profile-driven kernel work.
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
    ap.add_argument("--variant", default="dense",
                    help="bench.py variant: dense|modules|plain|sorted|fused")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    os.environ["BENCH_VARIANT"] = args.variant
    import bench

    trainer, dev = bench._build(args.variant)
    step = trainer._build_train_step()
    key = jax.random.key(0)
    one = jnp.float32(1.0)
    state = trainer.state
    for _ in range(3):
        state, loss, gn = step(state, dev, key, one)
    float(loss)  # hard sync (block_until_ready under-reports on the tunnel)

    jax.profiler.start_trace(args.out)
    for _ in range(args.steps):
        state, loss, gn = step(state, dev, key, one)
    float(loss)
    jax.profiler.stop_trace()
    print(f"trace written to {args.out}")


if __name__ == "__main__":
    main()
