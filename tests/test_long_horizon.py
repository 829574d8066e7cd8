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
    n = 60
    scene = synthetic.Scene.urban(np.random.default_rng(7), extent=50.0)
    gt = synthetic.varied_trajectory(n, step=0.8)

    state = frontend.init_state(CFG, jnp.float32)
    poses = []
    for i in range(n):
        xyz, inten = synthetic.simulate_scan(
            gt[i], scene, rings=32, az_steps=1024,
            rng=np.random.default_rng(i), noise=0.005,
        )
        raw = Cloud.from_numpy(xyz, inten, capacity=32 * 1024, dtype=jnp.float32)
        state, pose, diag = frontend.odometry_step_nodonate(state, raw, CFG)
        poses.append(np.asarray(pose))
    est = np.stack(poses)

    gt_sensor = gt.copy()
    gt_sensor[:, 2, 3] += 1.73
    gt_rel = np.linalg.inv(gt_sensor[0])[None] @ gt_sensor

    drift = np.linalg.norm(est[:, :3, 3] - gt_rel[:, :3, 3], axis=1)
    t_err, r_err = trajectory.kitti_odometry_errors(gt_rel, est)
    ate = trajectory.ate_rmse(gt_rel, est)

    # budgets: the varied drive crosses occlusions, stops, and reverses —
    # a real regression shows up as many metres of drift (frame-10-style
    # jumps were ~10 m before the degeneracy fix). This scenario's sharp-turn
    # frames sit near a sensitivity edge: bit-equivalent builds measured
    # 1.58-3.2 m final drift purely from f32 summation-order differences
    # (pytest-harness runs vs standalone runs of the SAME code differ by
    # ~1 m; bisected round 2 — every code group "caused" it). The budgets
    # are therefore blow-up canaries sized above that band; tightening the
    # turn segment itself (see TLSConfig.coarse_scale) is the
    # accuracy lead that would shrink both the value and the variance.
    assert drift[-1] < 4.0, (drift[-1], drift[::10])
    assert drift.max() < 4.5, (drift.max(), drift[::10])
    assert ate < 2.5, ate
    if not np.isnan(t_err):
        assert t_err < 8.0, t_err  # % over 100-800m segments
