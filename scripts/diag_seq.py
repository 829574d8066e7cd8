"""Track per-frame correspondence counts over the full bench sequence to find
where the planar family dies (VERDICT weak #2)."""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tloam_tpu.cloud import Cloud
from tloam_tpu.pipeline import frontend
from tloam_tpu.utils import synthetic


def main():
    cfg = frontend.PipelineConfig()
    rings, az = 64, 1870
    cap = 131072
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 15

    scene = synthetic.Scene.urban(np.random.default_rng(3), extent=80.0)
    gt = synthetic.straight_trajectory(n_frames, step=1.0, yaw_rate=0.005)
    state = frontend.init_state(cfg, jnp.float32)
    for i in range(n_frames):
        xyz, inten = synthetic.simulate_scan(
            gt[i], scene, rings=rings, az_steps=az,
            rng=np.random.default_rng(i), noise=0.01,
        )
        raw = Cloud.from_numpy(xyz, inten, capacity=cap, dtype=jnp.float32)
        t0 = time.time()
        state, pose, diag = frontend.odometry_step(state, raw, cfg)
        pose = np.asarray(pose)
        gt_t = gt[i][:3, 3]
        err = np.linalg.norm(pose[:3, 3] - gt_t)
        print(
            f"frame {i:2d}: iters={int(diag.iterations)} "
            f"corr={np.asarray(diag.num_corr)} deg={bool(diag.degenerate)} "
            f"t=[{pose[0,3]:8.3f} {pose[1,3]:8.3f} {pose[2,3]:8.3f}] "
            f"ate={err:7.4f} wall={time.time()-t0:6.1f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
