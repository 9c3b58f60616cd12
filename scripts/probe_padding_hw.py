#!/usr/bin/env python
"""Hardware probe: does HBM traffic scale with LOGICAL or PADDED bytes
for narrow trailing dims?

Times a jitted elementwise doubling of bf16[rows, w] for w in {8..512}
at FIXED rows (so padded tiles per row are constant for w<=128 if the
compiler keeps the row-major layout, while logical bytes scale with w).
If the copy time is ~flat across w<=128, the DMA moves lane-padded
tiles (padding is real traffic); if time scales ~linearly with w, XLA's
layout choices keep narrow buffers packed (transposed or re-tiled) and
padding is NOT a real cost at these shapes.

Also prints each program's chosen input/output layouts (from the
compiled executable's HLO) so the conclusion names the layout XLA
actually picked.

    python scripts/probe_padding_hw.py
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ROWS = 1 << 20  # 1M rows: bf16[1M, w] = 2*w MB logical
WIDTHS = (8, 16, 32, 64, 100, 116, 128, 256, 512)
REPEATS = 10
PEAK_GBPS = 819.0  # v5e


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import re

    rows = []
    for w in WIDTHS:
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(ROWS, w)), jnp.bfloat16
        )

        @jax.jit
        def f(a):
            return a * 2 + 1

        y = f(x)
        y.block_until_ready()
        # layout actually chosen (from the optimized HLO text)
        try:
            hlo = f.lower(x).compile().as_text()
            lay = re.findall(r"bf16\[\d+,\d+\]\{[^}]*\}", hlo)
            layouts = sorted(set(lay))[:2]
        except Exception:
            layouts = []

        # K executions in one dispatch: difference two loop lengths to
        # cancel dispatch overhead (same protocol as bench.py)
        def loop(a, k):
            def body(_, acc):
                return acc * 2 + 1

            return jax.lax.fori_loop(0, k, body, a).sum()

        g = jax.jit(loop)
        float(g(x, 4))
        float(g(x, 64))

        def timed(k):
            best = float("inf")
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                float(g(x, k))
                best = min(best, time.perf_counter() - t0)
            return best

        t = (timed(64) - timed(4)) / 60.0
        logical_gb = 2 * (2 * ROWS * w) / 1e9  # read + write
        padded_w = -(-w // 128) * 128
        padded_gb = 2 * (2 * ROWS * padded_w) / 1e9
        rows.append({
            "w": w,
            "ms": round(t * 1e3, 3),
            "gbps_if_logical": round(logical_gb / t, 0),
            "gbps_if_padded": round(padded_gb / t, 0),
            "layouts": layouts,
        })
        print(json.dumps(rows[-1]))

    # verdict: which byte model keeps achieved bandwidth <= peak and
    # ~constant across widths?
    log_ok = all(r["gbps_if_logical"] <= PEAK_GBPS * 1.05 for r in rows)
    pad_ok = all(r["gbps_if_padded"] <= PEAK_GBPS * 1.05 for r in rows)
    print(json.dumps({
        "verdict_logical_model_feasible": log_ok,
        "verdict_padded_model_feasible": pad_ok,
    }))


if __name__ == "__main__":
    main()
