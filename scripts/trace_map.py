"""Join a perfetto trace (per-op device times) with the compiled HLO's
op_name metadata, attributing device time to source-level stages.

Usage: python scripts/trace_map.py [--frames 3]
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default=None)
    ap.add_argument("--frames", type=int, default=3)
    args = ap.parse_args()
    if args.outdir is None:
        import tempfile
        args.outdir = tempfile.mkdtemp(prefix="tloam_trace_")

    import jax
    import jax.numpy as jnp

    from tloam_tpu.cloud import Cloud
    from tloam_tpu.pipeline import frontend
    from tloam_tpu.utils import synthetic

    cfg = frontend.PipelineConfig()
    scene = synthetic.Scene.urban(np.random.default_rng(3), extent=80.0)
    gt = synthetic.straight_trajectory(args.frames + 2, step=1.0, yaw_rate=0.005)
    scans = [
        synthetic.simulate_scan(
            gt[i], scene, rings=64, az_steps=1870,
            rng=np.random.default_rng(i), noise=0.01,
        )
        for i in range(args.frames + 2)
    ]
    state = frontend.init_state(cfg, jnp.float32)
    mkraw = lambda i: Cloud.from_numpy(*scans[i], capacity=131072, dtype=jnp.float32)
    state, pose, _ = frontend.odometry_step(state, mkraw(0), cfg)
    state, pose, _ = frontend.odometry_step(state, mkraw(1), cfg)
    np.asarray(pose)  # real sync (block_until_ready is a no-op on axon)

    # HLO with metadata
    lowered = jax.jit(frontend._odometry_step_impl, static_argnums=2).lower(
        state, mkraw(2), cfg
    )
    hlo = lowered.compile().as_text()

    # op -> source attribution from metadata op_name
    src = {}
    for m in re.finditer(
        r"%?([\w.\-]+) = [^\n]*metadata={op_name=\"([^\"]*)\"", hlo
    ):
        src[m.group(1)] = m.group(2)

    os.makedirs(args.outdir, exist_ok=True)
    jax.profiler.start_trace(args.outdir, create_perfetto_trace=True)
    for i in range(2, 2 + args.frames):
        state, pose, diag = frontend.odometry_step(state, mkraw(i), cfg)
    np.asarray(pose)
    jax.profiler.stop_trace()

    paths = sorted(
        glob.glob(os.path.join(args.outdir, "**", "*.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    durs = defaultdict(float)
    counts = defaultdict(int)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            name = ev.get("name", "?")
            durs[name] += ev["dur"]
            counts[name] += 1

    def stage_of(opname: str) -> str:
        # op_name like jit(_odometry_step_impl)/cond/branch_1_fun/preprocess/...
        # keep the most informative path segments
        parts = opname.split("/")
        keep = [p for p in parts if p and not p.startswith("jit(")]
        return "/".join(keep[:6])

    by_stage = defaultdict(float)
    unattributed = 0.0
    for name, d in durs.items():
        if name in src:
            by_stage[stage_of(src[name])] += d
        else:
            unattributed += d
    total = sum(durs.values())
    print(f"total traced op time: {total/1e3:.1f} ms over {args.frames} frames")
    print(f"unattributed (host rows etc.): {unattributed/1e3/args.frames:.2f} ms/frame")
    print("--- by source stage (ms/frame) ---")
    for st, d in sorted(by_stage.items(), key=lambda kv: -kv[1])[:48]:
        print(f"{d/1e3/args.frames:9.2f}  {st}")

    print("--- top single ops ---")
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:30]:
        tag = src.get(name, "?")
        print(f"{d/1e3/args.frames:9.2f} ms/frame x{counts[name]:4d} {name}  <- {tag[:110]}")


if __name__ == "__main__":
    main()
