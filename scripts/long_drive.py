"""Long-horizon accuracy artifact (VERDICT r4 next #3/#6): synthetic town
drive through the shared drives harness (cached raycasts), reporting KITTI
segment metrics (t% and deg/100m — reference README.md:31-36) with the
per-length breakdown, ATE/RPE, and a drift curve. Writes LONGDRIVE_r{N}.json.

Route 'c' (town_trajectory_loop) supports arbitrarily long drives (500+
frames) whose KITTI metric averages several segment lengths; --f32 runs the
unpacked float path for the packed-vs-f32 accuracy comparison.
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
    ap.add_argument("--round", type=int, default=5)
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--route", default="a")
    ap.add_argument("--rings", type=int, default=64)
    ap.add_argument("--az", type=int, default=1870)
    ap.add_argument("--world", type=int, default=3)
    ap.add_argument("--out", default=None)
    ap.add_argument("--f32", action="store_true",
                    help="unpacked f32 transfer instead of the int16 packed path")
    ap.add_argument("--easy", action="store_true",
                    help="disable moving cars / occlusions / ring stagger")
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    args = ap.parse_args()

    from tloam_tpu.config import load_pipeline_config
    from tloam_tpu.utils import drives, trajectory

    cfg = load_pipeline_config(None, args.set)
    t0 = time.time()
    est, gt_rel, info = drives.hard_town_drive(
        cfg, frames=args.frames, route=args.route,
        world_seed=args.world, cars_seed=args.world + 8,
        occ_seed=args.world + 9, rings=args.rings, az=args.az,
        hard=not args.easy, packed=not args.f32,
        progress=lambda i, p, d: print(f"f{i}", file=sys.stderr, flush=True),
    )
    m = drives.drive_metrics(est, gt_rel)

    # per-segment-length breakdown (KITTI averages lengths 100..800; a
    # 120-frame drive only reaches 100 m — the 500+ frame route-c drive is
    # what makes the headline statistically meaningful, VERDICT r4 #5)
    per_len = {}
    for L in (100.0, 200.0, 300.0, 400.0, 500.0, 600.0, 700.0, 800.0):
        t_err, r_err, n = trajectory.kitti_odometry_errors(
            gt_rel, est, lengths=(L,), return_count=True
        )
        if n:
            per_len[str(int(L))] = {
                "t_err_pct": round(float(t_err), 4),
                "r_err_deg_per_100m": round(float(r_err), 4),
                "segments": int(n),
            }

    payload = {
        "metric": "long_drive_kitti_errors",
        "frames": args.frames,
        "route": args.route,
        "world_seed": args.world,
        "transfer": "f32" if args.f32 else "packed_int16",
        "hard": not args.easy,
        "config_overrides": args.set,
        "per_segment_length": per_len,
        "segment_lengths_contributing": len(per_len),
        "wall_s": round(info["wall_s"], 1),
        "degenerate_frames": info["degenerate_frames"],
        **m,
    }
    out = args.out or f"LONGDRIVE_r{args.round:02d}.json"
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    traj_out = out.replace(".json", "_traj.txt")
    trajectory.save_kitti(traj_out, est)
    print(json.dumps({k: payload[k] for k in (
        "kitti_t_err_pct", "kitti_r_err_deg_per_100m", "ate_rmse_m",
        "segment_lengths_contributing")}))


if __name__ == "__main__":
    main()
