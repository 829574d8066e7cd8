"""Depth / RGBD / voxel-grid cloud factories vs NumPy re-derivation
(reference PointCloud2.cpp:1493-1643)."""
import jax.numpy as jnp
import numpy as np

from tloam_tpu.ops import factories


def test_depth_image_roundtrip(rng):
    # synthesize a depth image of a plane z = 2 tilted slightly
    H, W = 48, 64
    fx = fy = 50.0
    cx, cy = W / 2, H / 2
    depth = np.full((H, W), 2.0, np.float32)
    depth[0, 0] = 0.0  # invalid pixel
    depth[1, 1] = np.nan
    cloud = factories.cloud_from_depth_image(
        jnp.asarray(depth), (fx, fy, cx, cy)
    )
    v = np.asarray(cloud.valid)
    assert v.sum() == H * W - 2
    pts = np.asarray(cloud.xyz)[v]
    # reproject: u = fx*x/z + cx must recover the pixel grid
    u = fx * pts[:, 0] / pts[:, 2] + cx
    w = fy * pts[:, 1] / pts[:, 2] + cy
    assert np.allclose(sorted(set(np.round(u).astype(int))), np.arange(W))
    assert np.all(np.abs(pts[:, 2] - 2.0) < 1e-6)
    assert np.all((np.round(w) >= 0) & (np.round(w) < H))


def test_depth_image_stride_and_extrinsic():
    H, W = 32, 32
    intr = (40.0, 40.0, 16.0, 16.0)
    depth = jnp.ones((H, W), jnp.float32) * 3.0
    T = jnp.asarray(np.diag([1.0, 1.0, 1.0, 1.0]).astype(np.float32))
    T = T.at[0, 3].set(5.0)  # world->camera translation +5 in x
    cloud = factories.cloud_from_depth_image(depth, intr, extrinsic=T, stride=2)
    assert cloud.capacity == (H // 2) * (W // 2)
    pts = np.asarray(cloud.xyz)
    # camera pose = T^-1 shifts points by -5 in x
    assert np.all(pts[:, 0] < 0.0 + 3.0)  # shifted left
    assert np.allclose(np.asarray(cloud.valid), True)


def test_rgbd_colors_uint8():
    H, W = 8, 8
    depth = jnp.ones((H, W), jnp.float32)
    color = jnp.full((H, W, 3), 128, jnp.uint8)
    cloud = factories.cloud_from_rgbd(depth, color, (10.0, 10.0, 4.0, 4.0))
    assert cloud.has_colors
    assert np.allclose(np.asarray(cloud.colors), 128 / 255.0)


def test_voxel_grid_centers():
    idx = jnp.asarray([[0, 0, 0], [2, 1, 0]])
    cloud = factories.cloud_from_voxel_grid(
        idx, 0.5, jnp.asarray([10.0, 0.0, 0.0])
    )
    np.testing.assert_allclose(
        np.asarray(cloud.xyz),
        [[10.25, 0.25, 0.25], [11.25, 0.75, 0.25]],
    )
