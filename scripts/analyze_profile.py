#!/usr/bin/env python
"""Aggregate a jax.profiler xplane trace into a per-op time table.

    python scripts/analyze_profile.py /tmp/gcp_profile [--top 30]

Finds the newest ``*.xplane.pb`` under the trace dir, decodes the XSpace
protobuf with a minimal built-in varint reader (no tensorflow/tbp needed —
this image's tensorboard_plugin_profile converter is incompatible with its
tensorflow), sums event durations on the TPU device plane's "XLA Ops" /
"XLA Modules" lines grouped by op name, and buckets ops into categories
(matmul/fusion-kind/copy/...).  This is the round-2/3 entry point for
profile-driven kernel work (RESULTS.md "op-level profile").
"""

import argparse
import collections
import glob
import os
import re
import sys


# ---------------------------------------------------------------------------
# minimal protobuf wire-format reader (only what XSpace needs)
# ---------------------------------------------------------------------------

def _read_varint(buf, pos):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7


def _iter_fields(buf, start=0, end=None):
    """Yield (field_number, wire_type, value) over a message buffer.
    value: int for varint/fixed, memoryview for length-delimited."""
    pos = start
    end = len(buf) if end is None else end
    while pos < end:
        tag, pos = _read_varint(buf, pos)
        field, wt = tag >> 3, tag & 7
        if wt == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wt == 1:  # 64-bit
            val = int.from_bytes(buf[pos : pos + 8], "little")
            pos += 8
        elif wt == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wt == 5:  # 32-bit
            val = int.from_bytes(buf[pos : pos + 4], "little")
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt} at {pos}")
        yield field, wt, val


def _zigzag(v):
    return (v >> 1) ^ -(v & 1)


def parse_xspace(path):
    """XSpace -> [{name, lines: [{name, events: [(metadata_id, dur_ps)]},
    event_names: {id: name}}]} ] keeping only what the table needs."""
    with open(path, "rb") as f:
        data = memoryview(f.read())
    planes = []
    for field, wt, val in _iter_fields(data):
        if field == 1 and wt == 2:  # XPlane
            planes.append(_parse_plane(val))
    return planes


def _parse_plane(buf):
    name = ""
    lines = []
    event_names = {}
    for field, wt, val in _iter_fields(buf):
        if field == 2 and wt == 2:
            name = bytes(val).decode("utf-8", "replace")
        elif field == 3 and wt == 2:
            lines.append(_parse_line(val))
        elif field == 4 and wt == 2:  # map<int64, XEventMetadata>
            key, meta_name = _parse_event_metadata_entry(val)
            event_names[key] = meta_name
    return {"name": name, "lines": lines, "event_names": event_names}


def _parse_event_metadata_entry(buf):
    key = 0
    name = ""
    for field, wt, val in _iter_fields(buf):
        if field == 1 and wt == 0:
            key = val
        elif field == 2 and wt == 2:  # XEventMetadata
            for f2, w2, v2 in _iter_fields(val):
                if f2 == 2 and w2 == 2:
                    name = bytes(v2).decode("utf-8", "replace")
    return key, name


def _parse_line(buf):
    name = ""
    events = []
    for field, wt, val in _iter_fields(buf):
        if field == 2 and wt == 2:
            name = bytes(val).decode("utf-8", "replace")
        elif field == 4 and wt == 2:  # XEvent (wire-verified on TPU traces)
            mid = dur = 0
            for f2, w2, v2 in _iter_fields(val):
                if f2 == 1 and w2 == 0:
                    mid = v2
                elif f2 == 3 and w2 == 0:  # duration_ps
                    dur = v2
            events.append((mid, dur, 1))
    return {"name": name, "events": events}


# ---------------------------------------------------------------------------
# op categorization
# ---------------------------------------------------------------------------

CATEGORY_RULES = [
    ("async-dma", re.compile(r"-start(\.\d+)?\s", re.I)),
    ("matmul", re.compile(r"dot|conv|matmul", re.I)),
    ("scatter", re.compile(r"scatter|segment", re.I)),
    ("gather", re.compile(r"gather|dynamic-slice|take", re.I)),
    ("sort", re.compile(r"sort", re.I)),
    ("copy/transpose", re.compile(r"copy|transpose|bitcast|reshape", re.I)),
    ("reduce", re.compile(r"reduce", re.I)),
    ("custom(pallas)", re.compile(r"custom-call|tpu_custom_call", re.I)),
    ("allreduce", re.compile(r"all-reduce|psum|collective", re.I)),
    ("fusion", re.compile(r"fusion", re.I)),
]

# "%maximum_add_fusion.3 = bf16[...] fusion(bf16[...] %copy.474, ...)":
# categorize by the *instruction name and opcode*, never the operand text —
# otherwise every fusion fed by a %copy lands in copy/transpose.
_NAME_RX = re.compile(r"^%?([\w.\-]+)\s*=\s*\S+\s+([\w\-]+)\(")


def categorize(name):
    m = _NAME_RX.match(name)
    head = f"{m.group(1)} {m.group(2)}" if m else name
    for cat, rx in CATEGORY_RULES:
        if rx.search(head):
            return cat
    return "other"


# control-flow wrapper ops CONTAIN their body iterations, which the trace
# also reports individually — counting both double-books ~half the plane
_WRAPPER_RX = re.compile(r"^%?(while|conditional)[.\d]*\s*=")

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
    "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
}
_SHAPE_RX = re.compile(r"\b(f64|f32|bf16|f16|s64|u64|s32|u32|s16|u16|s8|u8|pred)\[([\d,]*)\]")


def output_bytes(op: str) -> int:
    """Estimated OUTPUT bytes of an op from the shapes printed before the
    opcode (tuple outputs sum their elements).  Operand shapes appear after
    the '(' so only the prefix is scanned."""
    cut = op.find(" = ")
    head = op[cut + 3:] if cut >= 0 else op
    paren = re.search(r"\s[\w\-]+\(", head)
    head = head[: paren.start()] if paren else head
    total = 0
    for dt, dims in _SHAPE_RX.findall(head):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def find_xplane(trace_dir):
    """Newest *.xplane.pb under a jax.profiler trace directory."""
    pbs = sorted(
        glob.glob(
            os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
        ),
        key=os.path.getmtime,
    )
    if not pbs:
        sys.exit(f"no .xplane.pb under {trace_dir}")
    return pbs[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--line", default="XLA Ops",
                    help="which device-plane line to aggregate")
    ap.add_argument("--iters", type=int, default=1,
                    help="divide times by N (e.g. the fori_loop trip count) "
                         "to report per-step costs")
    ap.add_argument("--keep-wrappers", action="store_true",
                    help="keep while/conditional wrapper ops (their body "
                         "iterations are also counted individually, so "
                         "totals double-book)")
    args = ap.parse_args()

    path = find_xplane(args.trace_dir)
    print(f"# {path}\n")
    planes = parse_xspace(path)
    for plane in planes:
        if "TPU" not in plane["name"] and "tpu" not in plane["name"].lower():
            continue
        names = plane["event_names"]
        for line in plane["lines"]:
            if args.line not in line["name"]:
                continue
            by_op = collections.Counter()
            occ = collections.Counter()
            for mid, dur, _ in line["events"]:
                op = names.get(mid, f"#{mid}")
                if not args.keep_wrappers and _WRAPPER_RX.match(op):
                    continue
                by_op[op] += dur
                occ[op] += 1
            total = sum(by_op.values())
            if not total:
                continue
            it = max(args.iters, 1)
            print(f"== plane '{plane['name']}' line '{line['name']}' "
                  f"total {total/1e9/it:.3f} ms"
                  + (f" PER STEP (/{it})" if it > 1 else "") + " ==")
            by_cat = collections.Counter()
            cat_bytes = collections.Counter()
            for op, d in by_op.items():
                cat = categorize(op)
                by_cat[cat] += d
                cat_bytes[cat] += output_bytes(op) * occ[op]
            print("\n-- by category (time | output bytes | implied write GB/s) --")
            for cat, d in by_cat.most_common():
                gbs = cat_bytes[cat] / (d / 1e12) / 1e9 if d else 0.0
                print(f"{d/total*100:6.2f}%  {d/1e9/it:9.3f} ms  "
                      f"{cat_bytes[cat]/1e6/it:9.1f} MB  {gbs:7.1f} GB/s  {cat}")
            tot_bytes = sum(cat_bytes.values())
            print(f"\ntotal output bytes: {tot_bytes/1e6/it:.1f} MB"
                  + (" per step" if it > 1 else ""))
            print(f"\n-- top {args.top} ops --")
            for op, d in by_op.most_common(args.top):
                print(f"{d/total*100:6.2f}%  {d/1e9/it:9.3f} ms  x{occ[op]:<5d}"
                      f" {output_bytes(op)/1e6:8.1f} MB  {op[:100]}")
            print()


if __name__ == "__main__":
    main()
