"""Tests for the extended PointCloud op family (C2 inventory parity)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tloam_tpu.cloud import Cloud
from tloam_tpu.ops import cloud_ops


def test_uniform_downsample(rng):
    c = Cloud.from_numpy(rng.normal(size=(100, 3)), capacity=128)
    out = cloud_ops.uniform_downsample(c, 5)
    assert int(out.count()) == 20
    kept = np.asarray(out.valid)[:100]
    assert np.array_equal(np.where(kept)[0], np.arange(0, 100, 5))


def test_random_downsample(rng):
    c = Cloud.from_numpy(rng.normal(size=(1000, 3)), capacity=1024)
    key = jax.random.PRNGKey(0)
    out = cloud_ops.random_downsample_count(c, 100, key)
    assert int(out.count()) == 100
    out2 = cloud_ops.random_downsample_ratio(c, 0.3, key)
    assert 200 < int(out2.count()) < 400


def test_voxel_downsample_and_trace(rng):
    pts = rng.uniform(-2, 2, size=(200, 3))
    c = Cloud.from_numpy(pts, capacity=256)
    out, trace = cloud_ops.voxel_downsample_and_trace(c, 1.0, 256)
    trace = np.asarray(trace)
    out_xyz = np.asarray(out.xyz)
    # every valid input maps to an output voxel containing it
    for i in range(200):
        assert trace[i] >= 0
        assert np.all(np.floor(out_xyz[trace[i]] + 1e-6) == np.floor(pts[i]) ) or (
            np.linalg.norm(out_xyz[trace[i]] - pts[i]) < np.sqrt(3)
        )
    # invalid slots have trace -1
    assert np.all(trace[200:] == -1)


def test_remove_radius_outliers(rng):
    dense = rng.normal(size=(200, 3)) * 0.5
    lonely = np.array([[50.0, 50, 50], [-40, 0, 0]])
    c = Cloud.from_numpy(np.concatenate([dense, lonely]), capacity=256)
    out = cloud_ops.remove_radius_outliers(c, nb_points=5, radius=1.0)
    v = np.asarray(out.valid)
    assert v[:200].mean() > 0.9
    assert not v[200] and not v[201]


def test_remove_statistical_outliers(rng):
    dense = rng.normal(size=(300, 3))
    lonely = np.array([[30.0, 0, 0]])
    c = Cloud.from_numpy(np.concatenate([dense, lonely]), capacity=512)
    out = cloud_ops.remove_statistical_outliers(c, nb_neighbors=10, std_ratio=2.0)
    v = np.asarray(out.valid)
    assert not v[300]
    assert v[:300].mean() > 0.8


def test_estimate_and_orient_normals(rng):
    # flat patch z=0
    pts = np.concatenate(
        [rng.uniform(-2, 2, size=(400, 2)), np.zeros((400, 1))], axis=1
    )
    c = Cloud.from_numpy(pts, capacity=512)
    c = cloud_ops.estimate_normals(c, radius=0.5, max_nn=16)
    nz = np.abs(np.asarray(c.normals)[:400, 2])
    assert np.mean(nz > 0.99) > 0.95
    # orient towards a camera above
    c2 = cloud_ops.orient_normals_towards(c, jnp.asarray([0.0, 0, 10.0]))
    assert np.all(np.asarray(c2.normals)[:400, 2][np.asarray(c2.valid)[:400]] > 0)
    c3 = cloud_ops.orient_normals_direction(c, jnp.asarray([0.0, 0, -1.0]))
    assert np.all(np.asarray(c3.normals)[:400, 2] < 0)


def test_orient_normals_consistent(rng):
    # sphere surface: consistent orientation should make normals outward
    # (up to a global flip anchored at the top point)
    u = rng.normal(size=(300, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    normals = u * rng.choice([-1.0, 1.0], size=(300, 1))  # random flips
    out = cloud_ops.orient_normals_consistent(u * 5.0, normals, k=8)
    agree = np.sum(out * u, axis=1)
    assert (agree > 0).mean() > 0.95


def test_cluster_dbscan(rng):
    a = rng.normal(size=(150, 3)) * 0.2
    b = rng.normal(size=(150, 3)) * 0.2 + np.array([10.0, 0, 0])
    noise = np.array([[5.0, 5, 5], [-5, -5, 5]])
    c = Cloud.from_numpy(np.concatenate([a, b, noise]), capacity=512)
    labels = np.asarray(cloud_ops.cluster_dbscan(c, eps=0.5, min_points=5))
    la, lb = labels[:150], labels[150:300]
    assert len(np.unique(la[la >= 0])) == 1
    assert len(np.unique(lb[lb >= 0])) == 1
    assert la[la >= 0][0] != lb[lb >= 0][0]
    assert np.all(labels[300:302] == -1)
    assert np.all(labels[302:] == -1)  # padding


def test_segment_plane_ransac(rng):
    # dominant ground plane + clutter
    ground = np.concatenate(
        [rng.uniform(-5, 5, size=(400, 2)), np.full((400, 1), 2.0)], axis=1
    )
    clutter = rng.uniform(-5, 5, size=(100, 3))
    c = Cloud.from_numpy(np.concatenate([ground, clutter]), capacity=512)
    plane, inliers = cloud_ops.segment_plane_ransac(
        c, distance_threshold=0.05, ransac_n=3, num_iterations=64,
        key=jax.random.PRNGKey(1),
    )
    plane = np.asarray(plane)
    sgn = np.sign(plane[2]) or 1.0
    assert abs(sgn * plane[2] - 1.0) < 1e-3
    assert abs(sgn * plane[3] + 2.0) < 0.02
    inl = np.asarray(inliers)
    assert inl[:400].mean() > 0.97


def test_distances(rng):
    a = Cloud.from_numpy(rng.normal(size=(50, 3)), capacity=64)
    b = a.translate(jnp.asarray([0.5, 0.0, 0.0]))
    d = np.asarray(cloud_ops.point_cloud_distance(b, a, radius=3.0))
    assert np.all(d[:50] <= 0.5 + 1e-6)

    md = np.asarray(cloud_ops.mahalanobis_distance(a))
    assert np.all(np.isfinite(md[:50])) and md[:50].mean() > 0.5

    nnd = np.asarray(cloud_ops.nearest_neighbor_distance(a, radius=5.0))
    assert np.all(nnd[:50] > 0)


def test_hidden_point_removal(rng):
    # points on a sphere: from outside, only the near hemisphere is visible
    u = rng.normal(size=(500, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    pts = u * 2.0
    cam = np.array([10.0, 0, 0])
    visible = cloud_ops.hidden_point_removal(pts, cam, radius=100.0)
    x_vis = pts[visible][:, 0]
    assert (x_vis > 0).mean() > 0.9


def test_cloud_channels_roundtrip(rng):
    from tloam_tpu.ops import se3

    pts = rng.normal(size=(50, 3))
    normals = rng.normal(size=(50, 3))
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    c = Cloud.from_numpy(pts, normals=normals, capacity=64)
    T = se3.exp(jnp.asarray(rng.normal(size=6) * 0.3))
    back = c.transform(T).transform(se3.inv(T))
    assert np.allclose(np.asarray(back.normals)[:50], normals, atol=1e-6)
    # crop_obb: a box rotated to align with the data keeps inside points
    c2 = c.crop_obb(
        jnp.zeros(3), jnp.eye(3), jnp.asarray([1.0, 1.0, 1.0])
    )
    want = np.all(np.abs(pts) <= 1.0, axis=1)
    assert np.array_equal(np.asarray(c2.valid)[:50], want)
    c3 = c.paint_uniform_color(jnp.asarray([1.0, 0.5, 0.0]))
    assert np.allclose(np.asarray(c3.colors)[0], [1.0, 0.5, 0.0])