"""Integration tests: full TLS-GNC scan-to-map registration on synthetic
geometry with a known SE(3) perturbation (BASELINE config 1/2 analogue)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tloam_tpu.cloud import Cloud
from tloam_tpu.config import TLSConfig
from tloam_tpu.models.registration import FeatureSet, fitness_score, scan_matching
from tloam_tpu.ops import se3

CFG = TLSConfig(
    planar_maxnum=2500,
    ground_maxnum=2500,
    edge_maxnum=600,
    sphere_maxnum=200,
    max_per_cell=16,
)


def synthetic_world(rng):
    """Ground plane + two walls (planar), vertical poles (edge), isolated
    blobs (sphere)."""
    # ground: dense grid on z=0, mild ripple
    gx, gy = np.meshgrid(np.linspace(-8, 8, 56), np.linspace(-8, 8, 56))
    ground = np.stack([gx.ravel(), gy.ravel(), 0.02 * np.sin(gx.ravel())], -1)

    # walls: x=+-5 planes (vertical planar features)
    wy, wz = np.meshgrid(np.linspace(-8, 8, 48), np.linspace(0, 4, 16))
    wall1 = np.stack([np.full(wy.size, 5.0), wy.ravel(), wz.ravel()], -1)
    wall2 = np.stack([np.full(wy.size, -5.0), wy.ravel(), wz.ravel()], -1)
    planar = np.concatenate([wall1, wall2])

    # poles: vertical lines at scattered (x, y)
    px = rng.uniform(-7, 7, size=(12, 2))
    pz = np.linspace(0, 3, 30)
    edge = np.concatenate(
        [np.stack([np.full(30, x), np.full(30, y), pz], -1) for x, y in px]
    )

    # spheres: isolated points
    sphere = rng.uniform(-7, 7, size=(60, 3))
    sphere[:, 2] = rng.uniform(0.5, 3.0, size=60)
    return ground, planar, edge, sphere


def as_features(ground, planar, edge, sphere, caps=(4096, 4096, 1024, 256), dtype=None):
    import jax.numpy as jnp

    dt = dtype or jnp.float32
    return FeatureSet(
        edge=Cloud.from_numpy(edge, capacity=caps[2], dtype=dt),
        sphere=Cloud.from_numpy(sphere, capacity=caps[3], dtype=dt),
        planar=Cloud.from_numpy(planar, capacity=caps[1], dtype=dt),
        ground=Cloud.from_numpy(ground, capacity=caps[0], dtype=dt),
    )


@pytest.mark.parametrize("mu_init", ["residual", "reference_zero"])
def test_scan_matching_recovers_pose(rng, mu_init):
    ground, planar, edge, sphere = synthetic_world(rng)
    submap = as_features(ground, planar, edge, sphere)

    xi_true = np.array([0.3, -0.2, 0.1, 0.02, -0.015, 0.03])
    T_true = se3.exp(jnp.asarray(xi_true))
    Tn = np.asarray(se3.inv(T_true))

    def to_scan(pts):
        return pts @ Tn[:3, :3].T + Tn[:3, 3]

    scan = as_features(
        to_scan(ground), to_scan(planar), to_scan(edge), to_scan(sphere)
    )

    cfg = dataclasses.replace(CFG, mu_init=mu_init)
    pose, diag = jax.jit(scan_matching, static_argnums=3)(
        scan, submap, jnp.eye(4, dtype=jnp.float64), cfg
    )
    err = se3.log(se3.inv(T_true) @ pose)
    assert np.linalg.norm(np.asarray(err)[:3]) < 5e-3, np.asarray(err)
    assert np.linalg.norm(np.asarray(err)[3:]) < 5e-4, np.asarray(err)
    assert int(diag.iterations) >= 1
    # correspondences were actually found in every family
    assert np.all(np.asarray(diag.num_corr) > 10), np.asarray(diag.num_corr)


def test_scan_matching_with_outliers_and_noise(rng):
    """GNC must reject gross outliers: corrupt 20% of sphere targets and add
    measurement noise; pose should still be recovered to a few mm."""
    ground, planar, edge, sphere = synthetic_world(rng)
    submap = as_features(ground, planar, edge, sphere)

    xi_true = np.array([0.2, 0.1, -0.05, 0.01, 0.02, -0.01])
    T_true = se3.exp(jnp.asarray(xi_true))
    Tn = np.asarray(se3.inv(T_true))

    def to_scan(pts, noise):
        return pts @ Tn[:3, :3].T + Tn[:3, 3] + rng.normal(size=pts.shape) * noise

    sphere_scan = to_scan(sphere, 0.005)
    # 20% gross outliers among sphere points
    n_out = len(sphere_scan) // 5
    sphere_scan[:n_out] += rng.uniform(0.5, 1.0, size=(n_out, 3))

    scan = as_features(
        to_scan(ground, 0.005),
        to_scan(planar, 0.005),
        to_scan(edge, 0.005),
        sphere_scan,
    )
    pose, diag = jax.jit(scan_matching, static_argnums=3)(
        scan, submap, jnp.eye(4, dtype=jnp.float64), CFG
    )
    err = se3.log(se3.inv(T_true) @ pose)
    assert np.linalg.norm(np.asarray(err)[:3]) < 1e-2, np.asarray(err)
    assert np.linalg.norm(np.asarray(err)[3:]) < 2e-3, np.asarray(err)


def test_scan_matching_predict_pose_head_start(rng):
    """With the exact pose as prediction, the solver must stay there."""
    ground, planar, edge, sphere = synthetic_world(rng)
    submap = as_features(ground, planar, edge, sphere)
    xi_true = np.array([0.3, -0.2, 0.1, 0.02, -0.015, 0.03])
    T_true = se3.exp(jnp.asarray(xi_true))
    Tn = np.asarray(se3.inv(T_true))

    def to_scan(pts):
        return pts @ Tn[:3, :3].T + Tn[:3, 3]

    scan = as_features(
        to_scan(ground), to_scan(planar), to_scan(edge), to_scan(sphere)
    )
    pose, _ = jax.jit(scan_matching, static_argnums=3)(scan, submap, T_true, CFG)
    err = se3.log(se3.inv(T_true) @ pose)
    assert np.linalg.norm(np.asarray(err)) < 1e-4


def test_fitness_score_aligned_vs_misaligned(rng):
    ground, planar, edge, sphere = synthetic_world(rng)
    fs = as_features(ground, planar, edge, sphere)
    fit_aligned, rmse_aligned = fitness_score(fs, fs, CFG)
    # the direct hash table may drop ~1e-3 of entries (documented); demand
    # near-total self-matching rather than bit-exact 4.0
    assert float(fit_aligned) > 3.98
    assert float(rmse_aligned) == pytest.approx(0.0, abs=1e-6)

    shifted = FeatureSet(*(c.translate(jnp.asarray([0.0, 0, 50.0])) for c in fs))
    fit_far, _ = fitness_score(shifted, fs, CFG)
    assert float(fit_far) < 0.1


def manhattan_canyon(rng):
    """Long street canyon at real map scale: walls at y=+-7 spanning
    x in [-45, 45], ground, sparse corner poles. At this scale a ~6 deg
    yaw miss is a genuine local-minimum trap for plain GN: near wall
    points slide freely along the wall while the yaw-informative distant
    points fall outside every fine match gate (the measured frame-37
    failure of DIAG_REVERSE, round 4)."""
    gx, gy = np.meshgrid(np.linspace(-45, 45, 180), np.linspace(-7, 7, 24))
    ground = np.stack([gx.ravel(), gy.ravel(), np.zeros(gx.size)], -1)
    wx, wz = np.meshgrid(np.linspace(-45, 45, 280), np.linspace(0.2, 5, 14))
    wall1 = np.stack([wx.ravel(), np.full(wx.size, 7.0), wz.ravel()], -1)
    wall2 = np.stack([wx.ravel(), np.full(wx.size, -7.0), wz.ravel()], -1)
    # cross-street facades at the far ends (what actually pins x)
    cy, cz = np.meshgrid(np.linspace(-7, 7, 40), np.linspace(0.2, 5, 14))
    cap1 = np.stack([np.full(cy.size, 45.0), cy.ravel(), cz.ravel()], -1)
    cap2 = np.stack([np.full(cy.size, -45.0), cy.ravel(), cz.ravel()], -1)
    planar = np.concatenate([wall1, wall2, cap1, cap2])
    px = rng.uniform(-40, 40, size=(14,))
    pz = np.linspace(0, 4, 24)
    edge = np.concatenate(
        [np.stack([np.full(24, x), np.full(24, 6.8 * s), pz], -1)
         for x, s in zip(px, rng.choice([-1, 1], size=14))]
    )
    sphere = rng.uniform(-40, 40, size=(40, 3))
    sphere[:, 1] = rng.uniform(-6, 6, size=40)
    sphere[:, 2] = rng.uniform(0.5, 3.0, size=40)
    return ground, planar, edge, sphere


def test_yaw_fan_recovers_missed_turn_onset(rng):
    """Turn-onset regression guard (round-4 DIAG_REVERSE frame 37): the
    prediction misses a full 0.098 rad/frame turn step. The yaw-hypothesis
    fan on coarse rounds must recover the rotation; without it the solve
    historically stalled in the unrotated local minimum (-6 deg heading
    locked in, 36 m of dead-reckoned drift by frame 104)."""
    ground, planar, edge, sphere = manhattan_canyon(rng)
    submap = as_features(ground, planar, edge, sphere, caps=(8192, 8192, 1024, 256))

    # in-place heading change + a frame of forward motion the predict misses
    yaw = np.deg2rad(5.6)
    c, s = np.cos(yaw), np.sin(yaw)
    T_true = np.eye(4)
    T_true[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1.0]]
    T_true[:3, 3] = [1.0, 0.15, 0.0]
    Tn = np.linalg.inv(T_true)

    def to_scan(pts):
        return pts @ Tn[:3, :3].T + Tn[:3, 3]

    scan = as_features(
        to_scan(ground), to_scan(planar), to_scan(edge), to_scan(sphere),
        caps=(8192, 8192, 1024, 256),
    )
    pose, diag = jax.jit(scan_matching, static_argnums=3)(
        scan, submap, jnp.eye(4), CFG
    )
    err = np.asarray(se3.log(se3.inv(jnp.asarray(T_true)) @ pose))
    yaw_err_deg = np.degrees(abs(err[5]))
    assert yaw_err_deg < 0.5, (yaw_err_deg, err)
    assert np.linalg.norm(err[:3]) < 0.15, err
