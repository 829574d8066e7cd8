"""Degenerate-frame containment: the solver must fall back to the motion
model when correspondences vanish (the reference aborts the process,
registration.cpp:928-929; SURVEY §5 'failure detection: none')."""
import jax
import jax.numpy as jnp
import numpy as np

from tloam_tpu.cloud import Cloud
from tloam_tpu.models.registration import FeatureSet, scan_matching
from tloam_tpu.ops import se3

from tests.test_registration import CFG


def empty_features(cap=256):
    return FeatureSet(
        edge=Cloud.empty(cap, jnp.float64),
        sphere=Cloud.empty(cap, jnp.float64),
        planar=Cloud.empty(cap, jnp.float64),
        ground=Cloud.empty(cap, jnp.float64),
    )


def test_no_correspondences_keeps_prediction(rng):
    scan = empty_features()
    submap = empty_features()
    predict = se3.exp(jnp.asarray([0.5, -0.2, 0.1, 0.05, 0.0, -0.02]))
    pose, diag = jax.jit(scan_matching, static_argnums=3)(scan, submap, predict, CFG)
    assert bool(diag.degenerate)
    assert np.allclose(np.asarray(pose), np.asarray(predict), atol=1e-12)
    assert np.all(np.isfinite(np.asarray(pose)))


def test_far_apart_clouds_keep_prediction(rng):
    # clouds exist but share no spatial overlap: zero correspondences
    pts = rng.normal(size=(200, 3))
    near = Cloud.from_numpy(pts, capacity=256, dtype=jnp.float64)
    far = Cloud.from_numpy(pts + 500.0, capacity=256, dtype=jnp.float64)
    scan = FeatureSet(edge=near, sphere=near, planar=near, ground=near)
    submap = FeatureSet(edge=far, sphere=far, planar=far, ground=far)
    predict = jnp.eye(4, dtype=jnp.float64)
    pose, diag = jax.jit(scan_matching, static_argnums=3)(scan, submap, predict, CFG)
    assert bool(diag.degenerate)
    assert np.allclose(np.asarray(pose), np.eye(4), atol=1e-12)
