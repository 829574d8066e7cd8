"""CPU-scale accuracy probe: the test_long_horizon scenario (60-frame varied
drive, urban scene, 32x1024 scans) with per-frame step errors printed —
fast-iteration companion to scripts/diag_turn.py (town scene, full density).
Run with JAX_PLATFORMS=cpu (or let the env default to TPU)."""
from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    if os.environ.get("TLOAM_DIAG_CPU", "1") == "1":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from tloam_tpu.cloud import Cloud
    from tloam_tpu.config import load_pipeline_config
    from tloam_tpu.pipeline import frontend
    from tloam_tpu.utils import synthetic, trajectory

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    cfg = load_pipeline_config(None, sys.argv[2:])
    scene = synthetic.Scene.urban(np.random.default_rng(7), extent=50.0)
    gt = synthetic.varied_trajectory(n, step=0.8)

    state = frontend.init_state(cfg, jnp.float32)
    poses = []
    prev = np.eye(4)
    t0 = time.time()
    for i in range(n):
        xyz, inten = synthetic.simulate_scan(
            gt[i], scene, rings=32, az_steps=1024,
            rng=np.random.default_rng(i), noise=0.005,
        )
        raw = Cloud.from_numpy(xyz, inten, capacity=32 * 1024, dtype=jnp.float32)
        state, pose, diag = frontend.odometry_step_nodonate(state, raw, cfg)
        pose = np.asarray(pose)
        poses.append(pose)
        rel_gt = np.linalg.inv(gt[i - 1]) @ gt[i] if i else np.eye(4)
        rel_e = np.linalg.inv(prev) @ pose
        dyg = math.degrees(math.atan2(rel_gt[1, 0], rel_gt[0, 0]))
        dye = math.degrees(math.atan2(rel_e[1, 0], rel_e[0, 0]))
        rel_terr = np.linalg.norm(rel_e[:3, 3] - rel_gt[:3, 3])
        drift = np.linalg.norm(pose[:3, 3] - (gt[i][:3, 3] - gt[0][:3, 3]))
        print(
            f"f{i:3d} it={int(diag.iterations)} corr={np.asarray(diag.num_corr)}"
            f" dyaw gt={dyg:5.2f} est={dye:5.2f}"
            f" relterr={rel_terr:.3f} drift={drift:6.2f}",
            flush=True,
        )
        prev = pose
    est = np.stack(poses)
    gt_sensor = gt.copy()
    gt_sensor[:, 2, 3] += 1.73
    gt_rel = np.linalg.inv(gt_sensor[0])[None] @ gt_sensor
    t_err, r_err = trajectory.kitti_odometry_errors(gt_rel, est)
    ate = trajectory.ate_rmse(gt_rel, est)
    drift = np.linalg.norm(est[:, :3, 3] - gt_rel[:, :3, 3], axis=1)
    print(
        f"SUMMARY t_err={t_err:.3f}% r_err={r_err:.3f}deg/100m ate={ate:.3f}m "
        f"final={drift[-1]:.3f}m max={drift.max():.3f}m wall={time.time()-t0:.0f}s"
    )


if __name__ == "__main__":
    main()
