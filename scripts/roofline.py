#!/usr/bin/env python
"""Roofline analysis of a captured train-step trace.

    python scripts/roofline.py /tmp/trace_r4 --iters 25

Unlike ``analyze_profile.py`` (which estimates OUTPUT bytes from the shape
strings in op names), this reads the profiler's own per-op cost stats from
the xplane protobuf — ``flops``, ``bytes_accessed`` and the per-memory-space
``memory_access_breakdown`` (operation_type read/write x memory_space) — and
joins them with measured op durations.  That yields the two floors the
step time can be compared against:

  * **HBM floor** = (HBM bytes read + written per step) / peak HBM GB/s —
    the time a perfectly-scheduled chip would need just to move this
    program's bytes through HBM.
  * **compute floor** = flops per step / peak bf16 FLOP/s.

``step_time / max(floors)`` says how close the schedule is to this HLO
program's own speed-of-light; shrinking the floor itself requires moving
fewer bytes (fusion, layout, remat), not better scheduling.

The memory_access_breakdown wire format is OpMetrics.MemoryAccessed from
tensorflow/core/profiler/protobuf/op_metrics.proto:
  field 1 operation_type (1=READ, 2=WRITE), field 2 memory_space
  (1=HBM, other=on-chip), field 3 bytes_accessed.
"""

import argparse
import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from analyze_profile import _iter_fields, categorize, find_xplane  # noqa: E402

PEAK_HBM_GBPS_DEFAULT = 819.0  # TPU v5e public spec
PEAK_BF16_TFLOPS_DEFAULT = 197.0


def _parse_stat(buf):
    """XStat -> (metadata_id, value)."""
    md = None
    val = None
    for f, w, v in _iter_fields(buf):
        if f == 1 and w == 0:
            md = v
        elif f in (2, 3, 4, 5, 6, 7, 8):
            val = bytes(v) if w == 2 else v
    return md, val


def _parse_mem_breakdown(buf):
    """repeated OpMetrics.MemoryAccessed -> [(op_type, space, bytes)]."""
    out = []
    for f, w, v in _iter_fields(buf):
        if f == 1 and w == 2:
            op = space = nbytes = 0
            for f2, w2, v2 in _iter_fields(v):
                if f2 == 1:
                    op = v2
                elif f2 == 2:
                    space = v2
                elif f2 == 3:
                    nbytes = v2
            out.append((op, space, nbytes))
    return out


def parse_tpu_plane(path):
    """Return (events_by_line, meta) for the TPU device plane.

    meta: {metadata_id: {name, flops, bytes, hbm_read, hbm_write}}
    events_by_line: {line_name: [(metadata_id, dur_ps)]}
    """
    with open(path, "rb") as f:
        data = memoryview(f.read())
    for f1, w1, plane in _iter_fields(data):
        if not (f1 == 1 and w1 == 2):
            continue
        name = ""
        stat_names = {}
        raw_lines = []
        raw_meta = []
        for f2, w2, v2 in _iter_fields(plane):
            if f2 == 2 and w2 == 2:
                name = bytes(v2).decode("utf-8", "replace")
            elif f2 == 3 and w2 == 2:
                raw_lines.append(v2)
            elif f2 == 4 and w2 == 2:
                raw_meta.append(v2)
            elif f2 == 5 and w2 == 2:  # map<int64, XStatMetadata>
                k = nm = None
                for f3, w3, v3 in _iter_fields(v2):
                    if f3 == 1 and w3 == 0:
                        k = v3
                    elif f3 == 2 and w3 == 2:
                        for f4, w4, v4 in _iter_fields(v3):
                            if f4 == 2 and w4 == 2:
                                nm = bytes(v4).decode()
                stat_names[k] = nm
        if "TPU" not in name or "#" in name:
            continue
        by_name = {v: k for k, v in stat_names.items()}
        meta = {}
        for entry in raw_meta:
            key = None
            info = {"name": "", "flops": 0, "bytes": 0,
                    "hbm_read": 0, "hbm_write": 0, "onchip": 0}
            for f3, w3, v3 in _iter_fields(entry):
                if f3 == 1 and w3 == 0:
                    key = v3
                elif f3 == 2 and w3 == 2:  # XEventMetadata
                    for f4, w4, v4 in _iter_fields(v3):
                        if f4 == 2 and w4 == 2:
                            info["name"] = bytes(v4).decode(
                                "utf-8", "replace")
                        elif f4 == 5 and w4 == 2:  # stats
                            md, val = _parse_stat(v4)
                            stat = stat_names.get(md)
                            if stat == "flops":
                                info["flops"] = int(val)
                            elif stat == "bytes_accessed":
                                info["bytes"] = int(val)
                            elif stat == "memory_access_breakdown":
                                for op, space, nb in _parse_mem_breakdown(
                                        val):
                                    if space == 1:
                                        k = ("hbm_read" if op == 1
                                             else "hbm_write")
                                        info[k] += nb
                                    else:
                                        info["onchip"] += nb
            if key is not None:
                meta[key] = info
        events_by_line = {}
        for raw in raw_lines:
            lname = ""
            events = []
            for f3, w3, v3 in _iter_fields(raw):
                if f3 == 2 and w3 == 2:
                    lname = bytes(v3).decode("utf-8", "replace")
                elif f3 == 4 and w3 == 2:
                    mid = dur = 0
                    for f4, w4, v4 in _iter_fields(v3):
                        if f4 == 1 and w4 == 0:
                            mid = v4
                        elif f4 == 3 and w4 == 0:
                            dur = v4
                    events.append((mid, dur))
            events_by_line[lname] = events
        return events_by_line, meta
    raise SystemExit("no TPU device plane found")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--iters", type=int, default=1,
                    help="loop trip count to divide by (per-step costs)")
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--peak-hbm-gbps", type=float,
                    default=PEAK_HBM_GBPS_DEFAULT)
    ap.add_argument("--peak-tflops", type=float,
                    default=PEAK_BF16_TFLOPS_DEFAULT)
    ap.add_argument("--write-floor", metavar="CONFIG_KEY", default=None,
                    help="record this trace's HBM GB/step under the given "
                         "bench config key (bench.py _config_key) in "
                         "scripts/roofline_floor.json — the anchor for "
                         "bench.py's vs_baseline")
    args = ap.parse_args()

    path = find_xplane(args.trace_dir)
    events_by_line, meta = parse_tpu_plane(path)
    events = events_by_line.get("XLA Ops") or max(
        events_by_line.values(), key=len)

    # aggregate: executed time per op x the op's static per-execution cost
    agg = collections.defaultdict(
        lambda: [0, 0, 0.0, 0.0, 0.0, 0.0])  # count, dur, fl, rd, wr, byt
    for mid, dur in events:
        info = meta.get(mid)
        if info is None or info["name"].startswith(("%while", "%conditional")):
            continue
        a = agg[mid]
        a[0] += 1
        a[1] += dur
        a[2] += info["flops"]
        a[3] += info["hbm_read"]
        a[4] += info["hbm_write"]
        a[5] += info["bytes"]

    it = args.iters
    tot_dur = sum(a[1] for a in agg.values()) / it / 1e12  # s
    tot_fl = sum(a[2] for a in agg.values()) / it
    tot_rd = sum(a[3] for a in agg.values()) / it
    tot_wr = sum(a[4] for a in agg.values()) / it
    hbm_gb = (tot_rd + tot_wr) / 1e9
    hbm_floor = (tot_rd + tot_wr) / (args.peak_hbm_gbps * 1e9)
    compute_floor = tot_fl / (args.peak_tflops * 1e12)
    floor = max(hbm_floor, compute_floor)

    print(f"# {path}")
    print(f"device-plane busy time : {tot_dur*1e3:10.2f} ms/step")
    print(f"HBM traffic            : {hbm_gb:10.2f} GB/step  "
          f"(read {tot_rd/1e9:.2f} + write {tot_wr/1e9:.2f})")
    print(f"flops                  : {tot_fl/1e12:10.3f} TF/step")
    print(f"HBM floor  @{args.peak_hbm_gbps:.0f} GB/s : "
          f"{hbm_floor*1e3:10.2f} ms/step")
    print(f"MXU floor  @{args.peak_tflops:.0f} TF/s  : "
          f"{compute_floor*1e3:10.2f} ms/step")
    print(f"bound                  : "
          f"{'HBM' if hbm_floor >= compute_floor else 'MXU'}"
          f"  (arithmetic intensity "
          f"{tot_fl/max(tot_rd+tot_wr,1):.1f} flop/byte vs ridge "
          f"{args.peak_tflops*1e12/(args.peak_hbm_gbps*1e9):.0f})")
    print(f"busy time / floor      : {tot_dur/max(floor,1e-12):10.2f}x  "
          f"(schedule efficiency {100*floor/max(tot_dur,1e-12):.0f}%)")
    print()
    if args.write_floor:
        import datetime
        import json

        floor_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "roofline_floor.json",
        )
        try:
            with open(floor_path) as f:
                table = json.load(f)
        except Exception:
            table = {"hbm_gb_per_step": {}, "provenance": {}}
        table["hbm_gb_per_step"][args.write_floor] = round(hbm_gb, 3)
        table["provenance"][args.write_floor] = {
            "trace": path,
            "date": datetime.date.today().isoformat(),
            "iters": it,
            "busy_ms": round(tot_dur * 1e3, 2),
        }
        with open(floor_path, "w") as f:
            json.dump(table, f, indent=1, sort_keys=True)
        print(f"(wrote {hbm_gb:.3f} GB/step -> {floor_path} "
              f"[{args.write_floor}])")

    print("-- by category (per step) --")
    cats = collections.defaultdict(lambda: [0.0, 0.0, 0.0])  # dur, hbm, fl
    for mid, (c, dur, fl, rd, wr, _) in agg.items():
        cat = categorize(meta[mid]["name"])
        cats[cat][0] += dur / it / 1e9
        cats[cat][1] += (rd + wr) / it / 1e9
        cats[cat][2] += fl / it / 1e12
    for cat, (ms, gb, tf) in sorted(cats.items(), key=lambda kv: -kv[1][1]):
        bw = gb / max(ms / 1e3, 1e-9)
        print(f"{gb:8.2f} GB {ms:8.2f} ms {bw:7.0f} GB/s "
              f"{tf:7.3f} TF  {cat}")
    print()
    print(f"-- top {args.top} ops by HBM traffic (per step) --")
    mids = sorted(agg, key=lambda m: -(agg[m][3] + agg[m][4]))
    for mid in mids[: args.top]:
        c, dur, fl, rd, wr, _ = agg[mid]
        nm = meta[mid]["name"]
        gb = (rd + wr) / it / 1e9
        ms = dur / it / 1e9
        bw = (rd + wr) / max(dur / 1e12, 1e-12) / 1e9
        print(f"{gb:8.3f} GB {ms:8.3f} ms {bw:7.0f} GB/s x{c:<5d}"
              f" {categorize(nm):<14s} {nm[:90]}")

    # schedule-slack attribution: per op, wasted ms = measured duration
    # minus the op's own bandwidth floor (its HBM bytes at peak GB/s).
    # Sorting by wasted time names the fusions to split/merge/re-lay —
    # the ops where the chip is neither streaming nor computing.
    print()
    print(f"-- top {args.top} ops by schedule slack "
          f"(ms above own HBM floor, per step) --")
    slack_rows = []
    for mid, (c, dur, fl, rd, wr, _) in agg.items():
        ms = dur / it / 1e9
        floor_ms = (rd + wr) / it / (args.peak_hbm_gbps * 1e6)
        mxu_ms = fl / it / (args.peak_tflops * 1e9)
        slack_rows.append(
            (ms - max(floor_ms, mxu_ms), ms, floor_ms, mxu_ms, c, mid))
    slack_rows.sort(key=lambda r: -r[0])
    tot_slack = sum(max(r[0], 0.0) for r in slack_rows)
    print(f"   (total positive slack {tot_slack:.1f} ms of "
          f"{tot_dur*1e3:.1f} ms busy)")
    for wasted, ms, floor_ms, mxu_ms, c, mid in slack_rows[: args.top]:
        nm = meta[mid]["name"]
        a = agg[mid]
        bw = (a[3] + a[4]) / max(a[1] / 1e12, 1e-12) / 1e9
        print(f"{wasted:8.3f} ms wasted | {ms:8.3f} ms @ {bw:6.0f} GB/s "
              f"(hbm floor {floor_ms:6.3f}, mxu {mxu_ms:6.3f}) x{c:<5d}"
              f" {categorize(nm):<14s} {nm[:80]}")


if __name__ == "__main__":
    main()
