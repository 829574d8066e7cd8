"""Warmup anatomy (VERDICT r2 next #4): where do the ~476 s of bench warmup go?

Splits the first-call cost of the hot jitted program (`odometry_step`) into:
  * trace+lower   — Python tracing to StableHLO (host CPU, pure JAX)
  * backend compile — lowered.compile(): XLA compilation for the backend
    (on the axon relay this includes shipping the module to the remote
    service and its compile queue)
  * first execute  — first real call: host->device transfer of ~131k-point
    buffers + dispatch + device run
  * steady-state   — subsequent calls (the bench's timed regime)

Run on the default backend (axon TPU) and optionally with a warm/cold
persistent compile cache to separate XLA work from relay floor. Appends a
row to COMPILE_BREAKDOWN.md.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--no-write", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tloam_tpu.cloud import Cloud
    from tloam_tpu.pipeline import frontend
    from tloam_tpu.utils import synthetic

    cfg = frontend.PipelineConfig()
    rings, az, cap = 64, 1870, 131072
    scene = synthetic.Scene.urban(np.random.default_rng(3), extent=80.0)
    gt = synthetic.straight_trajectory(args.frames, step=1.0, yaw_rate=0.005)
    scans = [
        synthetic.simulate_scan(
            gt[i], scene, rings=rings, az_steps=az,
            rng=np.random.default_rng(i), noise=0.01,
        )
        for i in range(args.frames)
    ]

    state = frontend.init_state(cfg, jnp.float32)
    raw0 = Cloud.from_numpy(scans[0][0], scans[0][1], capacity=cap, dtype=jnp.float32)

    jitted = jax.jit(frontend._odometry_step_impl, static_argnums=2)

    t0 = time.time()
    lowered = jitted.lower(state, raw0, cfg)
    t_lower = time.time() - t0
    print(f"trace+lower: {t_lower:.1f}s", file=sys.stderr, flush=True)

    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    print(f"backend compile: {t_compile:.1f}s", file=sys.stderr, flush=True)

    try:
        mem = compiled.memory_analysis()
        mem_note = (
            f"peak {getattr(mem, 'temp_size_in_bytes', 0)/2**20:.0f} MiB temp, "
            f"{getattr(mem, 'argument_size_in_bytes', 0)/2**20:.0f} MiB args"
        )
    except Exception:
        mem_note = "n/a"

    t0 = time.time()
    state2, pose, _ = compiled(state, raw0)
    np.asarray(pose)
    t_first = time.time() - t0
    print(f"first execute (incl. H2D): {t_first:.1f}s", file=sys.stderr, flush=True)

    t0 = time.time()
    n_steady = 0
    for xyz, inten in scans[1:]:
        raw = Cloud.from_numpy(xyz, inten, capacity=cap, dtype=jnp.float32)
        state2, pose, _ = compiled(state2, raw)
        n_steady += 1
    np.asarray(pose)
    t_steady = (time.time() - t0) / max(n_steady, 1)
    print(f"steady-state per frame: {t_steady:.3f}s", file=sys.stderr, flush=True)

    backend = jax.default_backend()
    cache_dir = jax.config.jax_compilation_cache_dir or "(unset)"
    row = (
        f"| {time.strftime('%Y-%m-%d %H:%M')} | {backend} | {t_lower:.1f} | "
        f"{t_compile:.1f} | {t_first:.1f} | {t_steady:.3f} | {mem_note} |"
    )
    print(row)
    if not args.no_write:
        path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "COMPILE_BREAKDOWN.md")
        fresh = not os.path.exists(path)
        with open(path, "a") as f:
            if fresh:
                f.write(
                    "# Warmup / compile breakdown (odometry_step)\n\n"
                    f"Persistent compile cache dir: {cache_dir}\n\n"
                    "| when | backend | trace+lower s | compile s | "
                    "first-exec s | steady s/frame | memory |\n"
                    "|---|---|---|---|---|---|---|\n"
                )
            f.write(row + "\n")


if __name__ == "__main__":
    main()
