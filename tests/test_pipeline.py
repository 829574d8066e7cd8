"""End-to-end odometry pipeline test on a synthetic raycast sequence."""
import dataclasses

import numpy as np
import pytest

from tloam_tpu.config import OdometryConfig, TLSConfig
from tloam_tpu.pipeline import frontend
from tloam_tpu.utils import synthetic, trajectory

# shrunken capacities: keep CPU compile + run time reasonable
SMALL_OD = OdometryConfig(
    scan_edge_cap=2048,
    scan_sphere_cap=256,
    scan_planar_cap=1024,
    scan_ground_cap=4096,
    submap_edge_cap=8192,
    submap_ground_cap=8192,
    tls=TLSConfig(max_per_cell=8),
)
CFG = frontend.PipelineConfig(
    odometry=SMALL_OD,
    max_voxels=16384,
    max_clusters=64,
    frame_planar_cap=2048,
    frame_sphere_cap=512,
)


@pytest.mark.slow
def test_odometry_on_synthetic_sequence(rng):
    scene = synthetic.Scene.urban(np.random.default_rng(5))
    n_frames = 5
    gt = synthetic.straight_trajectory(n_frames, step=0.6, yaw_rate=0.02)

    scans = []
    for i in range(n_frames):
        xyz, inten = synthetic.simulate_scan(
            gt[i], scene, rings=24, az_steps=768, rng=np.random.default_rng(i),
            noise=0.005,
        )
        scans.append((i, (xyz, inten)))

    poses, diags = frontend.run_sequence(scans, CFG, raw_cap=24 * 768)

    # ground-truth sensor poses: translation at sensor origin (z + 1.73)
    gt_sensor = gt.copy()
    gt_sensor[:, 2, 3] += 1.73
    # odometry is relative to frame 0
    gt_rel = np.linalg.inv(gt_sensor[0])[None] @ gt_sensor

    # per-frame translation error
    t_err = np.linalg.norm(poses[:, :3, 3] - gt_rel[:, :3, 3], axis=1)
    assert t_err[-1] < 0.15, t_err
    rpe_t, rpe_r = trajectory.rpe(gt_rel, poses)
    # budget recalibrated (round 3) after the urban scene's lane-crossing
    # ghost walls were split to flank the corridor: startup frame 1 at this
    # reduced density (24 rings) measures 0.14 m, dominating the 5-frame RPE
    # at 0.084; steady-state frames sit at 0.05-0.07.
    assert rpe_t < 0.1, (rpe_t, t_err)
    assert rpe_r < 1.0, rpe_r

    # diagnostics sane: solver ran with correspondences in later frames
    assert int(diags[-1].num_corr.sum()) > 200, diags[-1]
