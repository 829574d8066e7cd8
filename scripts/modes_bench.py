"""Bench the reference-faithful mode matrix on hardware (VERDICT r1 next
#10, extended per r3 next #8 to a LONG drive with real accuracy metrics).

The TPU-fast defaults (pca_mode=cell, corr_mode=cell_plane,
plane_residual=point_to_plane) trade exactness of the reference's per-point
KD-tree searches for cell-aggregated geometry. This script quantifies that
trade: each mode runs the SAME synthetic town drive (scans synthesized
once, reused), reporting frames/s plus trajectory accuracy vs ground truth
(t_err / ATE / final drift) — 10-frame final-pose deltas could not separate
mode accuracy from noise (r3 weak #7). Writes MODES_r{N}.json.

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
    # sphere-family ablation (VERDICT r3 next #7): factor_num=3 drops the
    # point-to-point family (reference registration.cpp:517-559) — measures
    # what the ~2% of correspondences it contributes buys in accuracy/fps
    "factor3": ["odometry.tls.factor_num=3"],
}


def run_mode(overrides, scans, gt_rel, cap, n_warm, extra=()):
    import jax
    import jax.numpy as jnp

    from tloam_tpu.cloud import Cloud
    from tloam_tpu.config import load_pipeline_config
    from tloam_tpu.pipeline import frontend
    from tloam_tpu.utils import drives

    cfg = load_pipeline_config(None, list(overrides) + list(extra))
    state = frontend.init_state(cfg, jnp.float32)
    poses = []
    t0 = time.time()
    for i in range(n_warm):
        q, n = Cloud.pack_scan(*scans[i], capacity=cap)
        state, pose, diag = frontend.odometry_step_packed(
            state, jnp.asarray(q), jnp.asarray(n, jnp.int32), cfg
        )
        poses.append(pose)
    np.asarray(pose)  # queue drain: axon relay's block_until_ready returns
    # before execution finishes (see bench.py sync note)
    warm_s = time.time() - t0

    t0 = time.time()
    for i in range(n_warm, len(scans)):
        q, n = Cloud.pack_scan(*scans[i], capacity=cap)
        state, pose, diag = frontend.odometry_step_packed(
            state, jnp.asarray(q), jnp.asarray(n, jnp.int32), cfg
        )
        poses.append(pose)
    np.asarray(pose)  # see warmup sync note
    dt = time.time() - t0
    n_timed = len(scans) - n_warm

    est = np.stack([np.asarray(p) for p in poses])
    m = drives.drive_metrics(est, gt_rel[: len(est)])
    return {
        "frames_per_s": round(n_timed / dt, 3),
        "warmup_s": round(warm_s, 1),
        "final_pose_t": est[-1, :3, 3].round(4).tolist(),
        "corr_last": np.asarray(diag.num_corr).tolist(),
        "iters_last": int(diag.iterations),
        **{k: m[k] for k in (
            "kitti_t_err_pct", "ate_rmse_m", "final_drift_m", "max_drift_m")},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=4)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--warm", type=int, default=2)
    ap.add_argument("--rings", type=int, default=64)
    ap.add_argument("--az", type=int, default=1870)
    ap.add_argument("--modes", default=",".join(MODES))
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from tloam_tpu.utils import synthetic

    # the LONGDRIVE world (route A, hard add-ons), synthesized ONCE and
    # reused by every mode — raycasting dominates wall time on this host
    scene = synthetic.Scene.town(np.random.default_rng(3), extent=140.0)
    gt = synthetic.town_trajectory(args.frames, step=1.0)
    cars = synthetic.moving_cars(
        args.frames, np.random.default_rng(11), n_cars=8, extent=140.0
    )
    occ = synthetic.occlusion_schedule(args.frames, np.random.default_rng(12))
    print("synthesizing scans...", file=sys.stderr, flush=True)
    scans = [
        synthetic.simulate_scan(
            gt[i], scene, rings=args.rings, az_steps=args.az,
            rng=np.random.default_rng(i), noise=0.01,
            boxes=cars[i], dropout_sectors=occ[i], ring_stagger=0.002,
        )
        for i in range(args.frames)
    ]
    cap = 1 << int(np.ceil(np.log2(args.rings * args.az)))
    gt_sensor = gt.copy()
    gt_sensor[:, 2, 3] += 1.73
    gt_rel = np.linalg.inv(gt_sensor[0])[None] @ gt_sensor

    results = {}
    default_t = None
    for name in args.modes.split(","):
        print(f"--- mode {name} ---", file=sys.stderr, flush=True)
        r = run_mode(MODES[name], scans, gt_rel, cap, args.warm, args.set)
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
        "metric": "mode_matrix_long_drive",
        "frames": args.frames,
        "regimes": "hard town drive (route A): turns, stop, reverse, "
        "moving cars, occlusion dropouts, ring stagger",
        "backend": jax.default_backend(),
        "modes": results,
    }
    path = args.out or f"MODES_r{args.round:02d}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
