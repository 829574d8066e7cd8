"""Bench the reference-faithful mode matrix on hardware (VERDICT r1 next #10).

The TPU-fast defaults (pca_mode=cell, corr_mode=cell_plane,
plane_residual=point_to_plane) trade exactness of the reference's per-point
KD-tree searches for cell-aggregated geometry. This script quantifies that
trade: each mode runs the same synthetic drive once, reporting frames/s and
the final-pose delta vs the default mode. Writes MODES_r{N}.json.

Modes (reference mechanisms they correspond to):
  default    — TPU-fast path
  pca_exact  — per-point kNN PCA (feature_extract.cpp:60-70 semantics)
  corr_knn   — per-iteration 5-NN plane/line fits (registration.cpp:571-635)
  gicp       — plane-to-plane covariance residuals (registration.cpp:649-702)
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


MODES = {
    "default": [],
    "pca_exact": ["feature.pca_mode=exact"],
    "corr_knn": ["odometry.tls.corr_mode=knn"],
    "gicp": ["odometry.tls.plane_residual=gicp"],
}


def run_mode(overrides, scans, cap, n_warm):
    import jax
    import jax.numpy as jnp

    from tloam_tpu.cloud import Cloud
    from tloam_tpu.config import load_pipeline_config
    from tloam_tpu.pipeline import frontend

    cfg = load_pipeline_config(None, overrides)
    state = frontend.init_state(cfg, jnp.float32)
    t0 = time.time()
    for i in range(n_warm):
        raw = Cloud.from_numpy(*scans[i], capacity=cap, dtype=jnp.float32)
        state, pose, diag = frontend.odometry_step_nodonate(state, raw, cfg)
    np.asarray(pose)  # queue drain: axon relay's block_until_ready returns
    # before execution finishes (see bench.py sync note)
    warm_s = time.time() - t0

    t0 = time.time()
    for i in range(n_warm, len(scans)):
        raw = Cloud.from_numpy(*scans[i], capacity=cap, dtype=jnp.float32)
        state, pose, diag = frontend.odometry_step_nodonate(state, raw, cfg)
    np.asarray(pose)  # see warmup sync note
    dt = time.time() - t0
    n_timed = len(scans) - n_warm
    return {
        "frames_per_s": round(n_timed / dt, 3),
        "warmup_s": round(warm_s, 1),
        "final_pose_t": np.asarray(pose)[:3, 3].round(4).tolist(),
        "corr_last": np.asarray(diag.num_corr).tolist(),
        "iters_last": int(diag.iterations),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=2)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--warm", type=int, default=2)
    ap.add_argument("--modes", default=",".join(MODES))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from tloam_tpu.utils import synthetic

    scene = synthetic.Scene.urban(np.random.default_rng(3), extent=80.0)
    gt = synthetic.straight_trajectory(args.frames, step=1.0, yaw_rate=0.005)
    scans = [
        synthetic.simulate_scan(
            gt[i], scene, rings=64, az_steps=1870,
            rng=np.random.default_rng(i), noise=0.01,
        )
        for i in range(args.frames)
    ]
    cap = 131072

    results = {}
    default_t = None
    for name in args.modes.split(","):
        print(f"--- mode {name} ---", file=sys.stderr, flush=True)
        r = run_mode(MODES[name], scans, cap, args.warm)
        if name == "default":
            default_t = np.asarray(r["final_pose_t"])
        if default_t is not None:
            r["final_pose_delta_vs_default_m"] = round(
                float(np.linalg.norm(np.asarray(r["final_pose_t"]) - default_t)), 4
            )
        results[name] = r
        print(f"{name}: {r}", file=sys.stderr, flush=True)

    import jax

    out = {
        "metric": "mode_matrix_frames_per_s",
        "frames": args.frames,
        "backend": jax.default_backend(),
        "modes": results,
    }
    path = args.out or f"MODES_r{args.round:02d}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
