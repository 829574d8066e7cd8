"""Reverse->forward transition diagnostic (VERDICT r3 task #1).

LONGDRIVE_r03 localizes ~90% of the residual error in frames 90-100: the
drive reverses at -0.5 m/frame (frames 79-88) then snaps to +1.0 m/frame
WHILE starting a right turn (frame 89, synthetic.town_trajectory segs) — the
constant-velocity prediction is off by 1.5 m + turn-onset yaw in one frame.

Runs the hard town drive (same settings as scripts/long_drive.py --hard) up
to --end and prints, for frames in [--from, --end):
  * gt vs est relative step (translation + yaw) and prediction error
  * the full per-round solver trace (corr counts / mean planar cost /
    coarse / aligned per GNC round)
  * degenerate / misaligned flags and the unhealthy streak
Saves everything to DIAG_REVERSE.npz for offline analysis.
"""
from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--end", type=int, default=108)
    ap.add_argument("--start", type=int, default=78, dest="start")
    ap.add_argument("--rings", type=int, default=64)
    ap.add_argument("--az", type=int, default=1870)
    ap.add_argument("--out", default="DIAG_REVERSE.npz")
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    args = ap.parse_args()

    import jax.numpy as jnp

    from tloam_tpu.cloud import Cloud
    from tloam_tpu.config import load_pipeline_config
    from tloam_tpu.pipeline import frontend
    from tloam_tpu.utils import synthetic

    cfg = load_pipeline_config(None, args.set)
    cap = 1 << int(np.ceil(np.log2(args.rings * args.az)))
    scene = synthetic.Scene.town(np.random.default_rng(3), extent=140.0)
    gt = synthetic.town_trajectory(args.end, step=1.0)
    cars = synthetic.moving_cars(
        args.end, np.random.default_rng(11), n_cars=8, extent=140.0
    )
    occ = synthetic.occlusion_schedule(args.end, np.random.default_rng(12))

    state = frontend.init_state(cfg, jnp.float32)
    prev_est = np.eye(4)
    poses, recs = [], []
    t0 = time.time()
    for i in range(args.end):
        xyz, inten = synthetic.simulate_scan(
            gt[i], scene, rings=args.rings, az_steps=args.az,
            rng=np.random.default_rng(i), noise=0.01,
            boxes=cars[i], dropout_sectors=occ[i], ring_stagger=0.002,
        )
        raw = Cloud.from_numpy(xyz, inten, capacity=cap, dtype=jnp.float32)
        predict_before = np.asarray(state.predict)
        state, pose, diag = frontend.odometry_step(state, raw, cfg)
        pose = np.asarray(pose)
        gt_i = gt[i].copy()
        gt_i[2, 3] += 1.73
        gt_0 = gt[0].copy()
        gt_0[2, 3] += 1.73
        gt_rel_world = np.linalg.inv(gt_0) @ gt_i  # world = first sensor frame
        rel_gt = np.linalg.inv(gt[i - 1]) @ gt[i] if i else np.eye(4)
        rel_e = np.linalg.inv(prev_est) @ pose
        pred_err = np.linalg.norm(predict_before[:3, 3] - gt_rel_world[:3, 3])
        drift = np.linalg.norm(pose[:3, 3] - gt_rel_world[:3, 3])
        rec = dict(
            frame=i,
            drift=drift,
            pred_err=pred_err,
            iters=int(diag.iterations),
            degen=int(diag.degenerate),
            misal=int(diag.misaligned),
            streak=int(state.unhealthy_streak),
            corr=np.asarray(diag.corr_trace),
            cost=np.asarray(diag.cost_trace),
            coarse=np.asarray(diag.coarse_trace),
            aligned=np.asarray(diag.aligned_trace),
        )
        recs.append(rec)
        poses.append(pose)
        if i >= args.start:
            dyg = math.degrees(math.atan2(rel_gt[1, 0], rel_gt[0, 0]))
            dye = math.degrees(math.atan2(rel_e[1, 0], rel_e[0, 0]))
            step_gt = rel_gt[:3, 3]
            step_e = rel_e[:3, 3]
            print(
                f"f{i:3d} drift={drift:6.3f} pred_err={pred_err:5.2f} "
                f"it={rec['iters']} deg={rec['degen']} mis={rec['misal']} "
                f"streak={rec['streak']} "
                f"step gt=({step_gt[0]:+.2f},{step_gt[1]:+.2f}) "
                f"est=({step_e[0]:+.2f},{step_e[1]:+.2f}) "
                f"dyaw gt={dyg:+.2f} est={dye:+.2f}",
                flush=True,
            )
            for r in range(rec["iters"]):
                print(
                    f"    r{r}: corr={rec['corr'][r]} "
                    f"cost={rec['cost'][r]:.3e} "
                    f"coarse={int(rec['coarse'][r])} "
                    f"aligned={int(rec['aligned'][r])}",
                    flush=True,
                )
        elif i % 20 == 0:
            print(f"f{i:3d} drift={drift:6.3f}", flush=True)
        prev_est = pose
    np.savez(
        args.out,
        poses=np.stack(poses),
        gt=gt,
        **{
            k: np.stack([r[k] for r in recs])
            for k in ("drift", "pred_err", "iters", "degen", "misal",
                      "corr", "cost", "coarse", "aligned")
        },
    )
    print(f"wall {time.time()-t0:.1f}s -> {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
