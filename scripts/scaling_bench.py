"""Scaling-efficiency harness: frame-parallel throughput at mesh sizes
1/2/4/8 (BASELINE.md target: >=0.8 efficiency at N>=2 hosts).

Writes EFFICIENCY_r{N}.json. On this container only virtual CPU devices are
available (JAX_PLATFORMS=cpu + xla_force_host_platform_device_count), so the
numbers exercise the sharded program end-to-end (partitioning, collectives,
output gathers) but share the same physical cores — honest efficiency
requires real multi-chip/multi-host hardware; the JSON records which mode
produced it. Run on hardware with: python scripts/scaling_bench.py --round N
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

if "--virtual" in sys.argv or os.environ.get("JAX_PLATFORMS", "") != "tpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=2)
    ap.add_argument("--virtual", action="store_true")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from tests.test_parallel import make_pair, stack_feature_sets  # reuse world
    from tests.test_registration import CFG
    from tloam_tpu.parallel import batched, mesh as mesh_lib

    n_avail = len(jax.devices())
    virtual = jax.default_backend() == "cpu"
    print(f"devices: {n_avail} ({jax.default_backend()})", file=sys.stderr)

    rng = np.random.default_rng(0)
    B = 8  # frames per measurement — divisible by every mesh size
    pairs = [make_pair(rng) for _ in range(B)]
    scans = stack_feature_sets([p[0] for p in pairs])
    submaps = stack_feature_sets([p[1] for p in pairs])
    predicts = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float64), (B, 4, 4))

    results = {}
    for n in (1, 2, 4, 8):
        if n > n_avail:
            continue
        m = mesh_lib.make_mesh(n_devices=n, frames=n)
        t_best = float("inf")
        out = batched.sharded_scan_matching(scans, submaps, predicts, CFG, m)
        jax.block_until_ready(out)  # compile
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = batched.sharded_scan_matching(scans, submaps, predicts, CFG, m)
            jax.block_until_ready(out)
            t_best = min(t_best, time.perf_counter() - t0)
        fps = B / t_best
        results[n] = fps
        print(f"mesh {n}: {fps:.2f} frames/s", file=sys.stderr)

    base = results.get(1)
    efficiency = {
        str(n): round(fps / (n * base), 4) if base else None
        for n, fps in results.items()
    }
    payload = {
        "metric": "frame_parallel_scaling_efficiency",
        "frames_per_s": {str(n): round(v, 3) for n, v in results.items()},
        "efficiency": efficiency,
        "devices": n_avail,
        "backend": jax.default_backend(),
        "virtual_devices": virtual,
        "note": (
            "virtual CPU devices share physical cores; efficiency numbers "
            "are structural (partitioning+collectives) not hardware scaling"
            if virtual else "real multi-device run"
        ),
    }
    path = f"EFFICIENCY_r{args.round:02d}.json"
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
