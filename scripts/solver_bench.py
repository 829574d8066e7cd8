"""Solver-only throughput: GN iterations/s/chip (BASELINE.md targets row 3,
VERDICT r2 next #6).

Isolates `scan_matching` — correspondence search + residual/Jacobian fusion +
6x6 solve + GNC schedule — from preprocessing by timing the jitted solver on
realistic feature sets captured from the synthetic pipeline. Reports:

  * solver-only solves/s (one solve = the full <=max_iterations GNC loop)
  * GN iterations/s = solves/s * mean(outer iters executed) * inner_iterations
    (each outer round runs `inner_iterations` damped-GN steps,
    registration.cpp:1036-1047's 4 Ceres inner iterations)

Writes GNITERS_r{N}.json at the repo root.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=3)
    ap.add_argument("--frames", type=int, default=8, help="distinct feature sets")
    ap.add_argument("--reps", type=int, default=4, help="timed passes over them")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tloam_tpu.cloud import Cloud
    from tloam_tpu.models.registration import scan_matching
    from tloam_tpu.pipeline import frontend
    from tloam_tpu.utils import synthetic

    cfg = frontend.PipelineConfig()
    tls = cfg.odometry.tls
    rings, az = 64, 1870
    cap = 131072

    scene = synthetic.Scene.urban(np.random.default_rng(3), extent=80.0)
    gt = synthetic.straight_trajectory(args.frames + 1, step=1.0, yaw_rate=0.005)

    # Drive the real pipeline to produce genuine (scan, submap, predict)
    # solver inputs — synthetic feature sets would mis-state gather locality.
    print("building solver inputs via the pipeline...", file=sys.stderr)
    state = frontend.init_state(cfg, jnp.float32)
    inputs = []
    for i in range(args.frames + 1):
        xyz, inten = synthetic.simulate_scan(
            gt[i], scene, rings=rings, az_steps=az,
            rng=np.random.default_rng(i), noise=0.01,
        )
        raw = Cloud.from_numpy(xyz, inten, capacity=cap, dtype=jnp.float32)
        if i >= 1:
            feats = jax.jit(frontend.preprocess_frame, static_argnums=1)(raw, cfg)
            submap = frontend.submap_features(state.submap, cfg)
            inputs.append(
                jax.tree.map(np.asarray, (feats.scan, submap, state.predict))
            )
        state, pose, _ = frontend.odometry_step(state, raw, cfg)
    np.asarray(pose)

    solver = jax.jit(scan_matching, static_argnums=3)

    # warmup/compile
    t0 = time.time()
    dev_inputs = [jax.tree.map(jnp.asarray, x) for x in inputs]
    pose, diag = solver(*dev_inputs[0], tls)
    np.asarray(pose)
    warm = time.time() - t0
    print(f"solver compile+first: {warm:.1f}s", file=sys.stderr)

    iters_seen = []
    t0 = time.time()
    for _ in range(args.reps):
        for s, m, p in dev_inputs:
            pose, diag = solver(s, m, p, tls)
            iters_seen.append(diag.iterations)
    np.asarray(pose)  # queue drain (axon relay; see bench.py)
    dt = time.time() - t0

    n_solves = args.reps * len(dev_inputs)
    solves_per_s = n_solves / dt
    mean_outer = float(np.mean([int(np.asarray(i)) for i in iters_seen]))
    gn_iters_per_s = solves_per_s * mean_outer * tls.inner_iterations

    payload = {
        "metric": "gn_iterations_per_s_per_chip",
        "value": round(gn_iters_per_s, 1),
        "unit": "GN iterations/s",
        "solves_per_s": round(solves_per_s, 2),
        "mean_outer_iters": round(mean_outer, 2),
        "inner_iterations": tls.inner_iterations,
        "n_solves_timed": n_solves,
        "solver_compile_s": round(warm, 1),
        "backend": jax.default_backend(),
    }
    out = f"GNITERS_r{args.round:02d}.json"
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
