#!/usr/bin/env python
"""Quantify TPU tile-padding waste in a captured train-step trace.

    python scripts/padding_analysis.py /tmp/trace_r4c --iters 25

Narrow trailing dims are physically padded to the (sublane, 128-lane)
tile on TPU: a bf16[E,48] buffer occupies lane-padded [E,128] tiles in
HBM, so every read/write of it moves 2.67x its logical bytes.  This
model family is full of narrow buffers (scalar 100, packed vectors 48,
edge scalars 32, edge vectors 12 — configs/model/model_cfg/
gcp_model_lba.yaml), so padding could be a material share of the
measured 74 GB/step (RESULTS.md round-4 roofline).

For every op in the trace's TPU device plane this script parses ALL
shape tokens from the HLO text (output shapes before the opcode,
operand shapes inside the parens), computes

  * logical bytes  = prod(dims) * dtype_size
  * padded bytes   = tile-padded size: last dim -> ceil(/128)*128,
    second-minor -> ceil(/sublane)*sublane with sublane = 32 / dtype_size
    (8 for f32, 16 for bf16, 32 for s8); rank-1 treated as [1, d]
    with lane padding only (second-minor padding of 1-D layouts is
    layout-dependent and small here)

and joins them with the profiler's measured per-op HBM read+write bytes
(`memory_access_breakdown`, see scripts/roofline.py).  Output:

  1. which convention the profiler's bytes follow (measured/logical vs
     measured/padded per op) — i.e. whether the measured 74 GB/step
     already includes padding traffic,
  2. total step traffic under both conventions -> the HBM bytes a
     padding-free (lane-packed) layout would move, which bounds what a
     packed-ScalarVector refactor could save,
  3. traffic histogram by trailing-dim width bucket, pointing at the
     buffers worth packing.

No analog in the reference (it publishes no profiling tooling at all —
SURVEY.md §5.1); this exists to steer the TPU-side layout design.
"""

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from analyze_profile import find_xplane  # noqa: E402
from analyze_profile import (  # noqa: E402
    _DTYPE_BYTES, _WRAPPER_RX, categorize,
)
from roofline import parse_tpu_plane  # noqa: E402

# shape token WITH its layout suffix as printed in TPU HLO dumps, e.g.
#   bf16[229376,116]{0,1:T(8,128)(2,1)}      <- transposed ({0,1}): the
#       long dim is MINOR, so lane padding hits 229376 (none), not 116
#   f32[7168,100]{1,0:T(8,128)}              <- row-major
#   bf16[116]{0:T(256)(128)(2,1)S(1)}        <- 1-D, alternate mem space
_LSHAPE_RX = re.compile(
    r"\b(f64|f32|bf16|f16|s64|u64|s32|u32|s16|u16|s8|u8|pred)"
    r"\[([\d,]*)\](?:\{([^}]*)\})?"
)
_TILE_RX = re.compile(r"T?\(([\d,]+)\)")


def shape_sizes(dt: str, dims_s: str, layout_s: str):
    """(logical_bytes, physical_bytes, minor_dim) for one shape token,
    honoring the printed layout: minor-to-major permutation + tiling.

    physical_bytes pads each tiled physical dim to its tile multiple
    (most-minor tile element -> the minor dim, etc.); for 16-bit types the
    trailing (2,1) element-packing group doubles the second-minor tile
    (bf16 tiles are effectively (16,128)).  Without a layout suffix the
    token is assumed row-major with the default (8,128) tile.  Rank-0/-1
    follow the printed 1-D tile (typically T(256) / T(1024)), so a
    bf16[116] occupies ceil(116/256)*256 elements.
    """
    s = _DTYPE_BYTES[dt]
    dims = [int(d) for d in dims_s.split(",") if d]
    logical = s
    for d in dims:
        logical *= d
    if not dims:
        return s, s, 1
    perm = list(range(len(dims) - 1, -1, -1))
    tiles = []
    if layout_s:
        head = layout_s.split(":", 1)
        if head[0]:
            try:
                perm = [int(x) for x in head[0].split(",")]
            except ValueError:
                pass
        if len(head) > 1:
            tiles = [
                [int(x) for x in g.split(",")]
                for g in _TILE_RX.findall(head[1])
            ]
    if not tiles:
        tiles = [[8, 128]] if len(dims) > 1 else [[128]]
    tile = tiles[0]
    # (2,1)-style packing groups for sub-32-bit types scale the
    # second-most-minor tile element (bf16: 8 sublanes x 2 packed = 16)
    for g in tiles[1:]:
        if len(g) >= 2 and g[0] > 1 and len(tile) >= 2:
            tile[-2] *= g[0]
    # physical dims, major -> minor
    phys = [dims[i] for i in reversed(perm)] if len(perm) == len(dims) \
        else list(dims)
    padded = s
    k = len(tile)
    for i, d in enumerate(phys):
        t_idx = i - (len(phys) - k)
        if t_idx >= 0:
            d = -(-d // tile[t_idx]) * tile[t_idx]
        padded *= d
    return logical, padded, phys[-1] if phys else 1


_HEAD_RX = re.compile(r"\s[\w\-]+\(")


def op_shape_totals(op: str):
    """(logical, padded, out_logical, out_padded, widths) summed over all
    shape tokens in the op text; widths = [(minor_physical_dim, logical,
    padded), ...] — the dim lane padding actually applies to under the
    printed layout, not the logical trailing dim."""
    cut = op.find(" = ")
    body = op[cut + 3:] if cut >= 0 else op
    paren = _HEAD_RX.search(body)
    head_end = paren.start() if paren else len(body)
    lo = pa = olo = opa = 0
    widths = []
    for m in _LSHAPE_RX.finditer(body):
        l, p, minor = shape_sizes(m.group(1), m.group(2), m.group(3) or "")
        lo += l
        pa += p
        if m.start() < head_end:
            olo += l
            opa += p
        widths.append((minor, l, p))
    return lo, pa, olo, opa, widths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--iters", type=int, default=1)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    path = find_xplane(args.trace_dir)
    events_by_line, meta = parse_tpu_plane(path)
    if not events_by_line:
        sys.exit(f"no TPU event lines in {path} — wrong or empty trace dir?")
    events = events_by_line.get("XLA Ops") or max(
        events_by_line.values(), key=len)

    agg = collections.defaultdict(lambda: [0, 0, 0])  # count, dur, hbm
    for mid, dur in events:
        info = meta.get(mid)
        # _WRAPPER_RX ('%' optional) keeps the while/conditional filter
        # consistent with analyze_profile/roofline on traces that print
        # unprefixed names
        if info is None or _WRAPPER_RX.match(info["name"]):
            continue
        a = agg[mid]
        a[0] += 1
        a[1] += dur
        a[2] += info["hbm_read"] + info["hbm_write"]

    it = max(args.iters, 1)
    tot_meas = tot_logical = tot_padded = 0.0
    # measured traffic re-apportioned at each op's logical/padded ratio:
    # what the step would move if every buffer were lane-packed
    tot_packed_equiv = 0.0
    width_meas = collections.Counter()
    width_savable = collections.Counter()
    rows = []
    for mid, (cnt, dur, hbm) in agg.items():
        name = meta[mid]["name"]
        lo, pa, _olo, _opa, widths = op_shape_totals(name)
        meas = hbm / it
        tot_meas += meas
        tot_logical += lo * cnt / it
        tot_padded += pa * cnt / it
        ratio = (lo / pa) if pa else 1.0
        tot_packed_equiv += meas * ratio
        # bucket the op's measured traffic by its shape tokens' widths,
        # weighted by each token's share of padded bytes
        if pa:
            for w, l, p in widths:
                share = p / pa
                bucket = w if w < 128 else (w // 128) * 128
                width_meas[bucket] += meas * share
                width_savable[bucket] += meas * share * (1 - l / p)
        rows.append((meas, name, cnt, lo * cnt / it, pa * cnt / it, dur))

    print(f"# {path}  (per step = /{it})")
    print(f"measured HBM traffic      : {tot_meas/1e9:9.2f} GB/step")
    print(f"shape-token logical bytes : {tot_logical/1e9:9.2f} GB/step")
    print(f"shape-token padded bytes  : {tot_padded/1e9:9.2f} GB/step")
    conv = ("PADDED" if abs(tot_meas - tot_padded)
            < abs(tot_meas - tot_logical) else "LOGICAL")
    print(f"profiler convention       : closest to {conv} "
          f"(meas/logical {tot_meas/max(tot_logical,1):.2f}, "
          f"meas/padded {tot_meas/max(tot_padded,1):.2f})")
    if tot_meas <= 0:
        print("lane-packed equivalent    : n/a — this profile has no per-op "
              "memory_access_breakdown stats (measured HBM bytes all zero); "
              "recapture with a profiler version that records them")
    else:
        print(f"lane-packed equivalent    : {tot_packed_equiv/1e9:9.2f} "
              f"GB/step ({100*(1-tot_packed_equiv/tot_meas):.0f}% of "
              f"measured traffic is tile padding if the profiler counts "
              f"padded bytes)")
    print()
    print("-- measured traffic by trailing-dim bucket "
          "(savable = padding share) --")
    for w in sorted(width_meas, key=lambda k: -width_meas[k]):
        print(f"  width {w:>5}: {width_meas[w]/1e9:8.2f} GB  "
              f"savable {width_savable[w]/1e9:8.2f} GB")
    print()
    print(f"-- top {args.top} ops: measured vs logical vs padded --")
    rows.sort(key=lambda r: -r[0])
    for meas, name, cnt, lo, pa, dur in rows[: args.top]:
        print(f"{meas/1e9:8.3f} GB meas | {lo/1e9:8.3f} log | "
              f"{pa/1e9:8.3f} pad | x{cnt:<4d} {categorize(name):<14s} "
              f"{name[:80]}")


if __name__ == "__main__":
    main()
