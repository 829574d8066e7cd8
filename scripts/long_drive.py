"""Long-horizon accuracy proxy (VERDICT r1 weak #5 / next #7): 100+ frame
synthetic drive with turns, stop-and-go, and a reverse segment; reports the
KITTI segment metrics (t% and deg/100m — README.md:31-36) plus ATE and a
drift curve. Writes LONGDRIVE_r{N}.json at the repo root.

Run on TPU (default env) or CPU (JAX_PLATFORMS=cpu ... after conftest-style
override — see scripts/diag_seq.py).
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
    ap.add_argument("--round", type=int, default=2)
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--rings", type=int, default=64)
    ap.add_argument("--az", type=int, default=1870)
    ap.add_argument("--out", default=None)
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    ap.add_argument(
        "--hard", action="store_true",
        help="KITTI-realism add-ons (VERDICT r2 #9): 8 moving cars, "
        "occlusion sector dropouts on ~25%% of frames, HDL-64 per-ring "
        "azimuth stagger",
    )
    args = ap.parse_args()

    import jax.numpy as jnp

    from tloam_tpu.cloud import Cloud
    from tloam_tpu.pipeline import frontend
    from tloam_tpu.utils import synthetic, trajectory

    from tloam_tpu.config import load_pipeline_config

    cfg = load_pipeline_config(None, args.set)
    cap = 1 << int(np.ceil(np.log2(args.rings * args.az)))
    # Manhattan town: turns lead into cross streets, like real urban
    # driving — the single-street `urban` scene starves any path that
    # leaves its corridor (measured: planar corr -> 0 for whole frame
    # stretches), which tests the scene, not the pipeline.
    scene = synthetic.Scene.town(np.random.default_rng(3), extent=140.0)
    # street-following route (straights + 3 turns + stop + reverse):
    # varied_trajectory was built for open worlds and drove mid-block
    # through town buildings — an unphysical instantaneous full-view flip
    gt = synthetic.town_trajectory(args.frames, step=1.0)
    if args.hard:
        cars = synthetic.moving_cars(
            args.frames, np.random.default_rng(11), n_cars=8, extent=140.0
        )
        occ = synthetic.occlusion_schedule(args.frames, np.random.default_rng(12))
        stagger = 0.002
    else:
        cars = [None] * args.frames
        occ = [None] * args.frames
        stagger = 0.0

    state = frontend.init_state(cfg, jnp.float32)
    poses, degenerate_frames = [], 0
    t_start = time.time()
    for i in range(args.frames):
        xyz, inten = synthetic.simulate_scan(
            gt[i], scene, rings=args.rings, az_steps=args.az,
            rng=np.random.default_rng(i), noise=0.01,
            boxes=cars[i], dropout_sectors=occ[i], ring_stagger=stagger,
        )
        q, n = Cloud.pack_scan(xyz, inten, capacity=cap)
        state, pose, diag = frontend.odometry_step_packed(
            state, jnp.asarray(q), jnp.asarray(n, jnp.int32), cfg
        )
        poses.append(np.asarray(pose))
        degenerate_frames += int(diag.degenerate)
        if i % 20 == 0:
            print(
                f"frame {i}: t={np.asarray(pose)[:3,3].round(2)} "
                f"corr={np.asarray(diag.num_corr)}",
                file=sys.stderr, flush=True,
            )
    wall = time.time() - t_start
    est = np.stack(poses)

    gt_sensor = gt.copy()
    gt_sensor[:, 2, 3] += 1.73
    gt_rel = np.linalg.inv(gt_sensor[0])[None] @ gt_sensor

    t_err, r_err = trajectory.kitti_odometry_errors(gt_rel, est)
    ate = trajectory.ate_rmse(gt_rel, est)
    rpe_t, rpe_r = trajectory.rpe(gt_rel, est)
    drift = np.linalg.norm(est[:, :3, 3] - gt_rel[:, :3, 3], axis=1)

    payload = {
        "metric": "long_horizon_varied_drive",
        "frames": args.frames,
        "kitti_t_err_pct": None if np.isnan(t_err) else round(float(t_err), 4),
        "kitti_r_err_deg_per_100m": None if np.isnan(r_err) else round(float(r_err), 4),
        "ate_rmse_m": round(float(ate), 4),
        "rpe_trans_m": round(float(rpe_t), 4),
        "rpe_rot_deg": round(float(rpe_r), 4),
        "final_drift_m": round(float(drift[-1]), 4),
        "max_drift_m": round(float(drift.max()), 4),
        "drift_curve_every10": [round(float(d), 3) for d in drift[::10]],
        "degenerate_frames": degenerate_frames,
        "wall_s": round(wall, 1),
        "regimes": "straight+3 turns+stop+reverse (synthetic.town_trajectory)"
        + (" + moving cars + occlusion dropouts + ring stagger" if args.hard else ""),
    }
    out = args.out or f"LONGDRIVE_r{args.round:02d}.json"
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    trajectory.save_kitti(out.replace(".json", "_traj.txt"), est)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
