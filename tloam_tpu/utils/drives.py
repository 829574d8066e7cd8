"""Shared synthetic-drive harness for accuracy artifacts (long_drive,
sweep, modes benches). One place defines what a "hard town drive" is:
Scene.town + street-following route + moving cars + occlusion dropouts +
per-ring azimuth stagger (the KITTI-realism add-ons of VERDICT r2 #9)."""
from __future__ import annotations

import time

import numpy as np


ROUTES = {"a": "town_trajectory", "b": "town_trajectory_b"}


def hard_town_drive(
    cfg,
    frames: int = 120,
    route: str = "a",
    world_seed: int = 3,
    cars_seed: int = 11,
    occ_seed: int = 12,
    rings: int = 64,
    az: int = 1870,
    hard: bool = True,
    progress=None,
    collect_diags: bool = False,
):
    """Run the full odometry pipeline over a synthetic town drive.

    Returns (est (F,4,4), gt_rel (F,4,4) sensor-frame ground truth relative
    to frame 0, info dict with wall time / degenerate count / diags)."""
    import jax.numpy as jnp

    from tloam_tpu.cloud import Cloud
    from tloam_tpu.pipeline import frontend
    from tloam_tpu.utils import synthetic

    cap = 1 << int(np.ceil(np.log2(rings * az)))
    scene = synthetic.Scene.town(np.random.default_rng(world_seed), extent=140.0)
    gt = getattr(synthetic, ROUTES[route])(frames, step=1.0)
    if hard:
        cars = synthetic.moving_cars(
            frames, np.random.default_rng(cars_seed), n_cars=8, extent=140.0
        )
        occ = synthetic.occlusion_schedule(frames, np.random.default_rng(occ_seed))
        stagger = 0.002
    else:
        cars, occ, stagger = [None] * frames, [None] * frames, 0.0

    state = frontend.init_state(cfg, jnp.float32)
    poses, diags = [], []
    degenerate = 0
    t0 = time.time()
    for i in range(frames):
        xyz, inten = synthetic.simulate_scan(
            gt[i], scene, rings=rings, az_steps=az,
            rng=np.random.default_rng(i), noise=0.01,
            boxes=cars[i], dropout_sectors=occ[i], ring_stagger=stagger,
        )
        q, n = Cloud.pack_scan(xyz, inten, capacity=cap)
        state, pose, diag = frontend.odometry_step_packed(
            state, jnp.asarray(q), jnp.asarray(n, jnp.int32), cfg
        )
        poses.append(np.asarray(pose))
        degenerate += int(diag.degenerate)
        if collect_diags:
            import jax

            diags.append(jax.tree.map(np.asarray, diag))
        if progress is not None and i % 20 == 0:
            progress(i, poses[-1], diag)
    wall = time.time() - t0

    gt_sensor = gt.copy()
    gt_sensor[:, 2, 3] += 1.73
    gt_rel = np.linalg.inv(gt_sensor[0])[None] @ gt_sensor
    est = np.stack(poses)
    return est, gt_rel, {
        "wall_s": wall, "degenerate_frames": degenerate, "diags": diags,
    }


def drive_metrics(est: np.ndarray, gt_rel: np.ndarray) -> dict:
    from tloam_tpu.utils import trajectory

    t_err, r_err = trajectory.kitti_odometry_errors(gt_rel, est)
    ate = trajectory.ate_rmse(gt_rel, est)
    rpe_t, rpe_r = trajectory.rpe(gt_rel, est)
    drift = np.linalg.norm(est[:, :3, 3] - gt_rel[:, :3, 3], axis=1)
    return {
        "kitti_t_err_pct": None if np.isnan(t_err) else round(float(t_err), 4),
        "kitti_r_err_deg_per_100m": (
            None if np.isnan(r_err) else round(float(r_err), 4)
        ),
        "ate_rmse_m": round(float(ate), 4),
        "rpe_trans_m": round(float(rpe_t), 4),
        "rpe_rot_deg": round(float(rpe_r), 4),
        "final_drift_m": round(float(drift[-1]), 4),
        "max_drift_m": round(float(drift.max()), 4),
        "drift_curve_every10": [round(float(d), 3) for d in drift[::10]],
    }
