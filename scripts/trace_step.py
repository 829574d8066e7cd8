"""Capture a perfetto trace of one odometry_step on TPU and print the top
time-consuming XLA ops, mapped to source where metadata allows.

Usage: python scripts/trace_step.py [--outdir /tmp/tloam_trace]
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/tloam_trace")
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--hlo", action="store_true", help="dump compiled HLO text")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tloam_tpu.cloud import Cloud
    from tloam_tpu.pipeline import frontend
    from tloam_tpu.utils import synthetic

    cfg = frontend.PipelineConfig()
    scene = synthetic.Scene.urban(np.random.default_rng(3), extent=80.0)
    gt = synthetic.straight_trajectory(args.frames + 2, step=1.0, yaw_rate=0.005)

    scans = []
    for i in range(args.frames + 2):
        scans.append(
            synthetic.simulate_scan(
                gt[i], scene, rings=64, az_steps=1870,
                rng=np.random.default_rng(i), noise=0.01,
            )
        )

    state = frontend.init_state(cfg, jnp.float32)
    mkraw = lambda i: Cloud.from_numpy(*scans[i], capacity=131072, dtype=jnp.float32)
    # warm both branches
    state, pose, _ = frontend.odometry_step(state, mkraw(0), cfg)
    state, pose, _ = frontend.odometry_step(state, mkraw(1), cfg)
    jax.block_until_ready(pose)

    if args.hlo:
        lowered = jax.jit(
            frontend._odometry_step_impl, static_argnums=2
        ).lower(state, mkraw(2), cfg)
        txt = lowered.compile().as_text()
        with open(os.path.join("/tmp", "odometry_step_hlo.txt"), "w") as f:
            f.write(txt)
        print("HLO written to /tmp/odometry_step_hlo.txt", file=sys.stderr)

    os.makedirs(args.outdir, exist_ok=True)
    jax.profiler.start_trace(args.outdir, create_perfetto_trace=True)
    for i in range(2, 2 + args.frames):
        state, pose, diag = frontend.odometry_step(state, mkraw(i), cfg)
    jax.block_until_ready(pose)
    jax.profiler.stop_trace()

    # parse the perfetto trace: aggregate 'X' events by name
    paths = sorted(
        glob.glob(os.path.join(args.outdir, "**", "*.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        print("no perfetto trace found", file=sys.stderr)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    durs = defaultdict(float)
    counts = defaultdict(int)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            name = ev.get("name", "?")
            durs[name] += ev["dur"]
            counts[name] += 1
    total = sum(durs.values())
    print(f"total traced op time: {total/1e3:.1f} ms over {args.frames} frames")
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{d/1e3/args.frames:9.2f} ms/frame  x{counts[name]:4d}  {name}")


if __name__ == "__main__":
    main()
