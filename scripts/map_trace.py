"""Map perfetto-trace op durations onto source locations using the compiled
HLO text's metadata. Usage:
  python scripts/map_trace.py --trace-dir /tmp/tloam_trace2 \
      --hlo /tmp/odometry_step_hlo.txt --frames 3
"""
import argparse
import glob
import gzip
import json
import os
import re
from collections import defaultdict


def parse_hlo_metadata(path):
    """instruction name -> (op_name, source_file:line)."""
    meta = {}
    pat = re.compile(
        r"%?([\w.\-]+)\s*=.*metadata=\{([^}]*)\}"
    )
    op_pat = re.compile(r'op_name="([^"]*)"')
    src_pat = re.compile(r'source_file="([^"]*)"')
    line_pat = re.compile(r"source_line=(\d+)")
    with open(path) as f:
        for line in f:
            m = pat.search(line)
            if not m:
                continue
            name, md = m.group(1), m.group(2)
            op = op_pat.search(md)
            sf = src_pat.search(md)
            sl = line_pat.search(md)
            src = ""
            if sf:
                src = os.path.basename(sf.group(1))
                if sl:
                    src += f":{sl.group(1)}"
            meta[name] = (op.group(1) if op else "", src)
    return meta


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/tloam_trace2")
    ap.add_argument("--hlo", default="/tmp/odometry_step_hlo.txt")
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--top", type=int, default=60)
    ap.add_argument("--group", choices=["src", "op", "raw"], default="src")
    args = ap.parse_args()

    meta = parse_hlo_metadata(args.hlo)
    paths = sorted(
        glob.glob(os.path.join(args.trace_dir, "**", "*.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)

    durs = defaultdict(float)
    counts = defaultdict(int)
    unmapped = defaultdict(float)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        name = ev.get("name", "?")
        if name.startswith("jit_") or name.startswith("$") or "block_until" in name:
            continue
        if name.startswith("while") or name.startswith("cond"):
            # control-flow wrappers double-count their bodies; skip
            continue
        op, src = meta.get(name, ("", ""))
        if not op and not src:
            unmapped[name] += ev["dur"]
            continue
        if args.group == "src":
            key = src or op.split("/")[-1]
        elif args.group == "op":
            key = "/".join(op.split("/")[:3]) or src
        else:
            key = f"{name} {src} {op[-60:]}"
        durs[key] += ev["dur"]
        counts[key] += 1

    total = sum(durs.values()) + sum(unmapped.values())
    print(f"mapped device op time: {total/1e3/args.frames:.1f} ms/frame")
    rows = sorted(durs.items(), key=lambda kv: -kv[1])[: args.top]
    for k, d in rows:
        print(f"{d/1e3/args.frames:9.2f} ms/f  x{counts[k]:5d}  {k}")
    if unmapped:
        u = sorted(unmapped.items(), key=lambda kv: -kv[1])[:10]
        print("-- unmapped --")
        for k, d in u:
            print(f"{d/1e3/args.frames:9.2f} ms/f  {k}")


if __name__ == "__main__":
    main()
