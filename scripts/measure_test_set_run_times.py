#!/usr/bin/env python
"""Measure test-set evaluation wall time for a trained experiment — the
analog of the reference's scripts/measure_test_set_run_times.bash.

    python scripts/measure_test_set_run_times.py \\
        experiment=gcpnet_nms_small ckpt_path=<ckpt dir> [overrides...]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import eval as eval_cli

    t0 = time.time()
    metrics = eval_cli.main(sys.argv[1:])
    dt = time.time() - t0
    print(f"test-set evaluation took {dt:.2f}s")
    for k, v in sorted(metrics.items()):
        print(f"  {k} = {v}")


if __name__ == "__main__":
    main()
