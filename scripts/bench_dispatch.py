#!/usr/bin/env python
"""Attribute per-execution dispatch overhead: tunnel RPC floor vs
argument-handle marshaling on the train state pytree.

bench.py measures ``dispatch_overhead_ms`` ~2x its ``null_dispatch_ms``
(~24 ms tunnel floor); the residual was attributed to marshaling the
large donated state pytree (RESULTS.md round-4 attribution) but never
measured in isolation.  This times three executables that do ~zero work:

  * ``null``     — scalar a+b (2 leaves): the pure tunnel RPC floor
  * ``pytree``   — identity over the REAL LBA TrainState (donated), same
                   leaf count/handles as the production train step
  * ``flat``     — identity over the same bytes packed into ONE array:
                   what pre-flattening the state could recover at best

If pytree >> flat, per-leaf handle marshaling is real and pre-staging is
worth building; if pytree ~= flat ~= null, the overhead is per-dispatch
(tunnel), already amortized by scan-chunking, and the ticket closes.

    python scripts/bench_dispatch.py
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPEATS = 20


def _best(fn):
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench

    trainer, dev_batch = bench._build("dense")
    state = trainer.state
    leaves = jax.tree_util.tree_leaves(state)
    nbytes = sum(l.nbytes for l in leaves)

    # null: pure RPC floor
    tiny = jax.jit(lambda a, b: a + b)
    ta, tb = jnp.float32(1.0), jnp.float32(2.0)
    float(tiny(ta, tb))
    null_ms = _best(lambda: float(tiny(ta, tb)))

    # pytree: donated identity over the real state (returns a scalar probe
    # so the fetch syncs without pulling the whole state to host)
    @jax.jit
    def touch_tree(st):
        probe = sum(jnp.sum(l) * 0 for l in jax.tree_util.tree_leaves(st))
        return st, probe + 1.0

    state, probe = touch_tree(state)
    float(probe)

    def run_tree():
        nonlocal state
        state, probe = touch_tree(state)
        float(probe)

    tree_ms = _best(run_tree)

    # flat: same bytes, ONE handle
    flat = jnp.zeros(nbytes // 4, jnp.float32)

    @jax.jit
    def touch_flat(a):
        return a, jnp.sum(a[:8]) * 0 + 1.0

    flat, probe = touch_flat(flat)
    float(probe)

    def run_flat():
        nonlocal flat
        flat, probe = touch_flat(flat)
        float(probe)

    flat_ms = _best(run_flat)

    print(json.dumps({
        "metric": "dispatch_overhead_attribution",
        "null_dispatch_ms": round(null_ms, 2),
        "state_pytree_ms": round(tree_ms, 2),
        "state_flat_ms": round(flat_ms, 2),
        "state_leaves": len(leaves),
        "state_mb": round(nbytes / 1e6, 1),
        "marshaling_ms": round(tree_ms - flat_ms, 2),
        "device_kind": getattr(jax.devices()[0], "device_kind", "?"),
    }))


if __name__ == "__main__":
    main()
