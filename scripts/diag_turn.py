"""Turn-onset diagnostic: drive the varied trajectory through its first turn
(frames ~28-44) on the town scene and print per-frame family correspondence
counts, GNC iterations, and relative-yaw tracking, to localize why the solver
misses the 0.06 rad/frame yaw step (LONGDRIVE_r02: est dyaw ~0.3 deg vs gt
3.44 deg for every turn frame)."""
from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp

    from tloam_tpu.cloud import Cloud
    from tloam_tpu.config import load_pipeline_config
    from tloam_tpu.pipeline import frontend
    from tloam_tpu.utils import synthetic

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 46
    overrides = sys.argv[2:]
    cfg = load_pipeline_config(None, overrides)
    rings, az = 64, 1870
    cap = 131072

    scene = synthetic.Scene.town(np.random.default_rng(3), extent=140.0)
    gt = synthetic.varied_trajectory(120, step=1.0)

    state = frontend.init_state(cfg, jnp.float32)
    prev_est = np.eye(4)
    t0 = time.time()
    for i in range(n_frames):
        xyz, inten = synthetic.simulate_scan(
            gt[i], scene, rings=rings, az_steps=az,
            rng=np.random.default_rng(i), noise=0.01,
        )
        raw = Cloud.from_numpy(xyz, inten, capacity=cap, dtype=jnp.float32)
        state, pose, diag = frontend.odometry_step(state, raw, cfg)
        pose = np.asarray(pose)
        rel_gt = np.linalg.inv(gt[i - 1]) @ gt[i] if i else np.eye(4)
        rel_e = np.linalg.inv(prev_est) @ pose
        dyg = math.degrees(math.atan2(rel_gt[1, 0], rel_gt[0, 0]))
        dye = math.degrees(math.atan2(rel_e[1, 0], rel_e[0, 0]))
        terr = np.linalg.norm(pose[:3, 3] - gt[i][:3, 3])
        rel_terr = np.linalg.norm(rel_e[:3, 3] - rel_gt[:3, 3])
        print(
            f"f{i:3d} it={int(diag.iterations)} corr={np.asarray(diag.num_corr)}"
            f" deg={int(diag.degenerate)} dyaw gt={dyg:5.2f} est={dye:5.2f}"
            f" relterr={rel_terr:.3f} ate={terr:6.2f}",
            flush=True,
        )
        prev_est = pose
    print(f"wall {time.time()-t0:.1f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
