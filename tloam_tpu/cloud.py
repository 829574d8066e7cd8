"""Fixed-shape masked point-cloud pytree — the framework's core container.

TPU-native replacement for the reference's ``open3d::geometry::PointCloud2``
(reference: include/tloam/open3d/PointCloud2.hpp:54-403), which is a ragged
SoA of std::vectors mutated in place. XLA requires static shapes, so every
cloud here is a fixed-capacity buffer plus a validity mask; all reference ops
that erase/filter points (RemoveNonFinitePoints, SelectByIndex, Crop, …)
become mask updates, and ops that merge clouds concatenate fixed buffers.

The container is a registered dataclass pytree: it passes through jit / vmap /
scan / shard_map boundaries transparently, and sharding a Cloud shards all
its leaves consistently.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.tree_util.register_dataclass, data_fields=["xyz", "intensity", "valid"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class Cloud:
    """A fixed-capacity point cloud.

    xyz       : (N, 3) float   point positions (garbage where ~valid)
    intensity : (N,)   float   per-point intensity (KITTI reflectance)
    valid     : (N,)   bool    which slots hold real points
    """

    xyz: jax.Array
    intensity: jax.Array
    valid: jax.Array

    @property
    def capacity(self) -> int:
        return self.xyz.shape[-2]

    def count(self) -> jax.Array:
        return jnp.sum(self.valid, axis=-1)

    # ---- constructors ----------------------------------------------------

    @staticmethod
    def empty(capacity: int, dtype=jnp.float32, batch: tuple = ()) -> "Cloud":
        return Cloud(
            xyz=jnp.zeros(batch + (capacity, 3), dtype),
            intensity=jnp.zeros(batch + (capacity,), dtype),
            valid=jnp.zeros(batch + (capacity,), bool),
        )

    @staticmethod
    def from_numpy(
        xyz: np.ndarray,
        intensity: np.ndarray | None = None,
        capacity: int | None = None,
        dtype=jnp.float32,
    ) -> "Cloud":
        """Pad (or truncate) host data to a fixed capacity bucket."""
        n = xyz.shape[0]
        cap = capacity if capacity is not None else n
        if intensity is None:
            intensity = np.zeros((n,), dtype=np.float32)
        if n > cap:
            xyz, intensity = xyz[:cap], intensity[:cap]
            n = cap
        pad = cap - n
        xyz_p = np.pad(xyz.astype(np.float32), ((0, pad), (0, 0)))
        int_p = np.pad(intensity.astype(np.float32), (0, pad))
        valid = np.arange(cap) < n
        return Cloud(
            xyz=jnp.asarray(xyz_p, dtype),
            intensity=jnp.asarray(int_p, dtype),
            valid=jnp.asarray(valid),
        )

    # ---- core ops (reference PointCloud2.cpp counterparts noted) ---------

    def transform(self, T: jax.Array) -> "Cloud":
        """Rigid transform of all points (PointCloud2.cpp:71-77)."""
        R = T[..., :3, :3]
        t = T[..., :3, 3]
        xyz = jnp.einsum("...ij,...nj->...ni", R, self.xyz) + t[..., None, :]
        return dataclasses.replace(self, xyz=xyz)

    def translate(self, t: jax.Array) -> "Cloud":
        return dataclasses.replace(self, xyz=self.xyz + t[..., None, :])

    def scale(self, s, center: jax.Array | None = None) -> "Cloud":
        c = jnp.mean(self.xyz, axis=-2, keepdims=True) if center is None else center[..., None, :]
        return dataclasses.replace(self, xyz=(self.xyz - c) * s + c)

    def mask(self, keep: jax.Array) -> "Cloud":
        """Logical-AND a predicate into validity (SelectByIndex / filtering,
        PointCloud2.cpp:197-243, as a mask update)."""
        return dataclasses.replace(self, valid=self.valid & keep)

    def remove_nonfinite(self) -> "Cloud":
        """RemoveNonFinitePoints (PointCloud2.cpp:158-195) as a mask-and."""
        return self.mask(jnp.all(jnp.isfinite(self.xyz), axis=-1))

    def remove_close(self, near_dis: float) -> "Cloud":
        """Drop points within near_dis of the sensor (the reference fuses this
        with non-finite removal, segmentation.cpp:472-499)."""
        return self.mask(jnp.sum(self.xyz * self.xyz, axis=-1) > near_dis * near_dis)

    def crop_aabb(self, lo: jax.Array, hi: jax.Array) -> "Cloud":
        """Axis-aligned crop box (PointCloud2.cpp:551-560)."""
        inside = jnp.all((self.xyz >= lo) & (self.xyz <= hi), axis=-1)
        return self.mask(inside)

    def concat(self, other: "Cloud") -> "Cloud":
        """Merge two clouds (operator+=, PointCloud2.cpp:96-132) by buffer
        concatenation — capacities add."""
        return Cloud(
            xyz=jnp.concatenate([self.xyz, other.xyz], axis=-2),
            intensity=jnp.concatenate([self.intensity, other.intensity], axis=-1),
            valid=jnp.concatenate([self.valid, other.valid], axis=-1),
        )

    def compact(self, capacity: int | None = None) -> "Cloud":
        """Gather valid points to the front (stable), pad the tail.

        This is the one O(N log N) reshuffle op; use sparingly (e.g. when
        shrinking a merged submap back to a fixed budget).
        """
        cap = capacity if capacity is not None else self.capacity
        order = jnp.argsort(~self.valid, stable=True)
        idx = order[..., :cap]
        take = lambda a: jnp.take_along_axis(a, idx, axis=-1)
        return Cloud(
            xyz=jnp.take_along_axis(self.xyz, idx[..., None], axis=-2),
            intensity=take(self.intensity),
            valid=take(self.valid),
        )

    def masked_xyz(self, fill: float = 1e9) -> jax.Array:
        """Points with invalid slots pushed to a far sentinel — handy before
        distance computations so padding never wins a nearest-neighbor race."""
        return jnp.where(self.valid[..., None], self.xyz, fill)

    def mean_and_covariance(self) -> tuple[jax.Array, jax.Array]:
        """Masked mean + covariance (PointCloud2.cpp:655-665)."""
        m = self.valid.astype(self.xyz.dtype)
        cnt = jnp.maximum(jnp.sum(m, axis=-1), 1.0)
        mean = jnp.sum(self.xyz * m[..., None], axis=-2) / cnt[..., None]
        diff = (self.xyz - mean[..., None, :]) * m[..., None]
        cov = jnp.einsum("...ni,...nj->...ij", diff, diff) / cnt[..., None, None]
        return mean, cov
