"""Generalization sweep of the accuracy number (VERDICT r3 next #6 /
weak #1): N world seeds x 2 routes at hard settings, same solver config as
the LONGDRIVE artifact. Writes SWEEP_r{N}.json with the full per-run metric
table plus mean/max t_err and ATE.

The round-3 concern: ~15 interlocking solver thresholds were all tuned on
ONE town drive (seeds 3/11/12). If 120-frame accuracy collapses under a
different building layout / traffic pattern / occlusion schedule or on the
second route, the thresholds are overfit — this artifact measures that
directly.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=4)
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--routes", default="a,b")
    ap.add_argument("--rings", type=int, default=64)
    ap.add_argument("--az", type=int, default=1870)
    ap.add_argument("--out", default=None)
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    args = ap.parse_args()

    from tloam_tpu.config import load_pipeline_config
    from tloam_tpu.utils import drives

    cfg = load_pipeline_config(None, args.set)
    runs = []
    for route in args.routes.split(","):
        for s in range(args.seeds):
            # seed 0 on route a reproduces the LONGDRIVE world (3/11/12)
            world, cars, occ = 3 + 101 * s, 11 + 101 * s, 12 + 101 * s
            est, gt_rel, info = drives.hard_town_drive(
                cfg, frames=args.frames, route=route,
                world_seed=world, cars_seed=cars, occ_seed=occ,
                rings=args.rings, az=args.az,
                progress=lambda i, p, d: print(
                    f"  [{route}/s{s}] f{i}", file=sys.stderr, flush=True
                ),
            )
            m = drives.drive_metrics(est, gt_rel)
            m.update(route=route, seed=s, world_seed=world,
                     degenerate_frames=info["degenerate_frames"],
                     wall_s=round(info["wall_s"], 1))
            runs.append(m)
            print(
                f"route {route} seed {s}: t_err={m['kitti_t_err_pct']}% "
                f"r_err={m['kitti_r_err_deg_per_100m']} ate={m['ate_rmse_m']}",
                file=sys.stderr, flush=True,
            )
            # incremental dump: a killed sweep still leaves a valid artifact
            _write(args, runs)

    payload = _write(args, runs)
    print(json.dumps({k: payload[k] for k in (
        "n_runs", "t_err_pct_mean", "t_err_pct_max", "ate_mean", "ate_max")}))


def _write(args, runs):
    t_errs = [r["kitti_t_err_pct"] for r in runs if r["kitti_t_err_pct"] is not None]
    ates = [r["ate_rmse_m"] for r in runs]
    payload = {
        "metric": "hard_drive_generalization_sweep",
        "frames": args.frames,
        "config_overrides": args.set,
        "n_runs": len(runs),
        "t_err_pct_mean": round(float(np.mean(t_errs)), 3) if t_errs else None,
        "t_err_pct_max": round(float(np.max(t_errs)), 3) if t_errs else None,
        "t_err_pct_per_run": t_errs,
        "ate_mean": round(float(np.mean(ates)), 3),
        "ate_max": round(float(np.max(ates)), 3),
        "runs": runs,
    }
    out = args.out or f"SWEEP_r{args.round:02d}.json"
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    return payload


if __name__ == "__main__":
    main()
