#!/usr/bin/env python
"""Dump the optimized TPU HLO of the benchmarked train step.

    python scripts/dump_hlo.py /tmp/hlo_r5.txt

Writes the post-optimization HLO text of the exact executable bench.py
times (the shard_map'd fori-loop train step), so slack-table fusion ids
from scripts/roofline.py can be looked up and understood.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hlo_dump.txt"
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    import bench

    trainer, dev_batch = bench._build(bench.VARIANT)
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

    mapped = shard_map(
        local,
        mesh=trainer.mesh,
        in_specs=(P(), P("dp"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    run_k = jax.jit(mapped, donate_argnums=(0,))
    compiled = run_k.lower(trainer.state, dev_batch, jnp.int32(4)).compile()
    text = compiled.as_text()
    with open(out_path, "w") as f:
        f.write(text)
    print(f"wrote {len(text)/1e6:.1f} MB -> {out_path}")


if __name__ == "__main__":
    main()
