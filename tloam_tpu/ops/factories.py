"""Point-cloud factory constructors: depth image / RGBD / voxel-grid.

TPU-native counterparts of the reference's PointCloud2 factories
(reference: src/open3d/PointCloud2.cpp:1493-1643 —
CreatePointCloudFromFloatDepthImage, CreateFromRGBDImage,
CreateFromVoxelGrid). The per-pixel double loops become one vectorized
back-projection; the ragged "valid pixels only" compaction becomes the
container's validity mask (project_valid_depth_only=True in the reference
merely drops invalid slots — here they are masked instead, same geometry).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tloam_tpu.cloud import Cloud


def cloud_from_depth_image(
    depth: jax.Array,  # (H, W) float metres; <=0 / non-finite = invalid
    intrinsics: tuple,  # (fx, fy, cx, cy)
    extrinsic: jax.Array | None = None,  # (4,4) world->camera
    stride: int = 1,
    depth_scale: float = 1.0,
    depth_trunc: float = jnp.inf,
) -> Cloud:
    """Back-project a depth image to a Cloud (CreatePointCloudFromFloat-
    DepthImage, PointCloud2.cpp:1493-1527): x=(j-cx)z/fx, y=(i-cy)z/fy,
    then points go through extrinsic^-1 (camera pose)."""
    fx, fy, cx, cy = intrinsics
    d = depth[::stride, ::stride].astype(jnp.float32) / depth_scale
    H, W = d.shape
    jj = jnp.arange(W, dtype=jnp.float32)[None, :]
    ii = jnp.arange(H, dtype=jnp.float32)[:, None]
    z = d
    x = (jj * stride - cx) * z / fx
    y = (ii * stride - cy) * z / fy
    pts = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    valid = (
        jnp.isfinite(z) & (z > 0) & (z < depth_trunc)
    ).reshape(-1)
    if extrinsic is not None:
        pose = jnp.linalg.inv(extrinsic)
        pts = pts @ pose[:3, :3].T + pose[:3, 3]
    return Cloud(
        xyz=pts,
        intensity=jnp.zeros(pts.shape[0], pts.dtype),
        valid=valid,
    )


def cloud_from_rgbd(
    depth: jax.Array,  # (H, W)
    color: jax.Array,  # (H, W, 3) uint8 or float
    intrinsics: tuple,
    extrinsic: jax.Array | None = None,
    depth_scale: float = 1.0,
    depth_trunc: float = jnp.inf,
) -> Cloud:
    """Depth back-projection + per-pixel colors (CreateFromRGBDImage,
    PointCloud2.cpp:1529-1592; uint8 colors are scaled by 1/255 like the
    reference's `scale` branch)."""
    cloud = cloud_from_depth_image(
        depth, intrinsics, extrinsic, 1, depth_scale, depth_trunc
    )
    c = color.reshape(-1, color.shape[-1]).astype(jnp.float32)
    if color.dtype == jnp.uint8:
        c = c / 255.0
    if c.shape[-1] == 1:  # grayscale -> replicated channels (float1 branch)
        c = jnp.broadcast_to(c, (c.shape[0], 3))
    return Cloud(
        xyz=cloud.xyz,
        intensity=cloud.intensity,
        valid=cloud.valid,
        colors=c[:, :3],
    )


def cloud_from_voxel_grid(
    grid_indices: jax.Array,  # (K,3) int voxel coordinates
    voxel_size,
    origin: jax.Array,  # (3,)
    valid: jax.Array | None = None,
    colors: jax.Array | None = None,
) -> Cloud:
    """One point at each voxel CENTER, carrying the voxel color
    (CreateFromVoxelGrid, PointCloud2.cpp:1623-1641;
    GetVoxelCenterCoordinate = origin + (idx + 0.5) * voxel_size)."""
    pts = (grid_indices.astype(jnp.float32) + 0.5) * voxel_size + origin
    n = pts.shape[0]
    if valid is None:
        valid = jnp.ones(n, bool)
    return Cloud(
        xyz=pts,
        intensity=jnp.zeros(n, pts.dtype),
        valid=valid,
        colors=colors,
    )
