"""PCA planar / sphere feature extraction.

TPU-native replacement for the reference's ``featureExtract``
(reference: src/models/feature_extraction/feature_extract.cpp:13-197). The
per-point OpenMP KNN + Eigen SelfAdjointEigenSolver loop becomes one batched
hash-grid query + closed-form 3x3 eigendecomposition over the whole cloud.

Semantics reproduced (with citations):
  * hybrid search radius 0.2 / K=20 including the query point itself
    (calculatePCAInfo :60-70); points with <= min_neigh neighbors carry no
    feature (:71-72).
  * cvr = lam0/sum(lams), flatness = (lam1-lam0)/lam2, normal = smallest-
    eigenvalue eigenvector (:105-119).
  * planar class: flatness > planar_submap_thres AND |normal_z| <
    planar_vertic_thres (:149-151).
  * sphere class: NOT planar AND cvr > cvr_submap AND cvr is a local max
    over the point's own neighbor set (:151-163).
  * scan selection: sort by flatness DESCENDING; planar scan keeps rank <
    planar_num OR flatness > planar_scan_thres; sphere scan keeps rank <
    sphere_num OR flatness > cvr_scan — yes, the reference compares the
    sphere's FLATNESS against the cvr_scan threshold (:167-189, quirk kept).
  * submap selection keeps every classified point (:167-189).
  * the reference's sphere-index bug (pushing the sort rank `id` instead of
    the point index, :184-189) is NOT reproduced by default; enable
    `sphere_index_bug=True` to get bit-faithful (wrong) selection.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tloam_tpu.cloud import Cloud
from tloam_tpu.config import FeatureConfig
from tloam_tpu.ops import eig3, voxel


class PCAInfo(NamedTuple):
    normal: jax.Array  # (N,3) smallest-eigenvector direction
    cvr: jax.Array  # (N,)
    flatness: jax.Array  # (N,)
    sphericity: jax.Array  # (N,)
    num_neigh: jax.Array  # (N,)
    has_info: jax.Array  # (N,) neighbor-count gate passed
    neigh_idx: jax.Array  # (N,K) neighbor indices
    neigh_ok: jax.Array  # (N,K)


def calculate_pca_info(
    cloud: Cloud, cfg: FeatureConfig, max_per_cell: int = 16,
    chunk_size: int = 16384,
) -> PCAInfo:
    """Per-point neighborhood PCA. Covariance moments are accumulated from
    SoA coordinate planes ((N,K) each) rather than an (N,K,3) tensor, and the
    eigen-features come from the scalar-component closed form — both to avoid
    TPU minor-dim padding blowups (see ops/voxel.py docstring)."""
    grid = voxel.build_hash_grid(cloud.xyz, cloud.valid, cfg.radius)
    idx, _, ok = voxel.query_knn(
        grid, cloud.xyz, cloud.valid, k=cfg.k, radius=cfg.radius,
        max_per_cell=max_per_cell, chunk_size=chunk_size,
    )
    dtype = cloud.xyz.dtype
    m = ok.astype(dtype)
    cnt = jnp.maximum(jnp.sum(m, axis=-1), 1.0)

    xs, ys, zs = voxel.gather_planes(cloud.xyz, idx)  # (N,K) each
    xs, ys, zs = xs * m, ys * m, zs * m
    mx = jnp.sum(xs, -1) / cnt
    my = jnp.sum(ys, -1) / cnt
    mz = jnp.sum(zs, -1) / cnt
    # E[ab] - E[a]E[b]  (masked second moments)
    a00 = jnp.sum(xs * xs, -1) / cnt - mx * mx
    a01 = jnp.sum(xs * ys, -1) / cnt - mx * my
    a02 = jnp.sum(xs * zs, -1) / cnt - mx * mz
    a11 = jnp.sum(ys * ys, -1) / cnt - my * my
    a12 = jnp.sum(ys * zs, -1) / cnt - my * mz
    a22 = jnp.sum(zs * zs, -1) / cnt - mz * mz

    lam0, lam1, lam2 = eig3.eigvalsh3_soa(a00, a01, a02, a11, a12, a22)
    nx, ny, nz = eig3.eigvec_soa(a00, a01, a02, a11, a12, a22, lam0)

    lam_sum = lam0 + lam1 + lam2
    cvr = jnp.where(lam_sum > 0, lam0 / jnp.maximum(lam_sum, 1e-30), 0.0)
    lam_hi = jnp.maximum(lam2, 1e-30)
    flatness = (lam1 - lam0) / lam_hi
    sphericity = lam0 / lam_hi
    n_neigh = jnp.sum(ok, axis=-1)
    has_info = cloud.valid & (n_neigh > cfg.min_neigh)
    normal = jnp.stack([nx, ny, nz], axis=-1)
    return PCAInfo(normal, cvr, flatness, sphericity, n_neigh, has_info, idx, ok)


class FeatureSelection(NamedTuple):
    planar_scan: jax.Array  # (N,) mask
    planar_submap: jax.Array  # (N,) mask
    sphere_scan: jax.Array
    sphere_submap: jax.Array
    pca: PCAInfo


def extract_planar_sphere(
    cloud: Cloud,
    cfg: FeatureConfig,
    max_per_cell: int = 16,
    sphere_index_bug: bool = False,
) -> FeatureSelection:
    """Classify + rank planar/sphere features (extractPlanarSphere,
    feature_extract.cpp:131-197). Returns slot masks over the input cloud."""
    pca = calculate_pca_info(cloud, cfg, max_per_cell)
    n = cloud.capacity

    planar_cls = (
        pca.has_info
        & (pca.flatness > cfg.planar_submap_thres)
        & (jnp.abs(pca.normal[:, 2]) < cfg.planar_vertic_thres)
    )
    # sphere: else-branch (NOT planar), cvr over threshold, local max of cvr
    # across own neighbors
    neigh_cvr = jnp.where(pca.neigh_ok, pca.cvr[pca.neigh_idx], -jnp.inf)
    local_max = jnp.all(
        jnp.where(pca.neigh_ok, pca.cvr[:, None] >= neigh_cvr, True), axis=-1
    )
    sphere_cls = (
        pca.has_info & ~planar_cls & (pca.cvr > cfg.cvr_submap) & local_max
    )

    def rank_desc(score, cls):
        """Descending rank among classified points (ties by index)."""
        s = jnp.where(cls, score, -jnp.inf)
        order = jnp.argsort(-s, stable=True)
        rank = jnp.zeros((n,), jnp.int32).at[order].set(
            jnp.arange(n, dtype=jnp.int32)
        )
        return rank

    planar_rank = rank_desc(pca.flatness, planar_cls)
    planar_scan = planar_cls & (
        (planar_rank < cfg.planar_num) | (pca.flatness > cfg.planar_scan_thres)
    )
    sphere_rank = rank_desc(pca.flatness, sphere_cls)  # sorted by flatness (quirk)
    if sphere_index_bug:
        # bit-faithful reference bug: the selected "sphere" indices are the
        # RANKS, i.e. the first `count` slots of the input cloud.
        count = jnp.sum(sphere_cls)
        keep = jnp.minimum(
            count,
            jnp.sum(
                sphere_cls
                & ((sphere_rank < cfg.sphere_num) | (pca.flatness > cfg.cvr_scan))
            ),
        )
        sphere_scan = (jnp.arange(n) < keep) & cloud.valid
        sphere_submap = (jnp.arange(n) < count) & cloud.valid
    else:
        sphere_scan = sphere_cls & (
            (sphere_rank < cfg.sphere_num) | (pca.flatness > cfg.cvr_scan)
        )
        sphere_submap = sphere_cls
    return FeatureSelection(planar_scan, planar_cls, sphere_scan, sphere_submap, pca)


def gather_top(
    cloud: Cloud, mask: jax.Array, score: jax.Array, capacity: int
) -> Cloud:
    """Compact the masked points into a fixed-capacity Cloud, keeping the
    highest-score points first (deterministic truncation when over capacity)."""
    s = jnp.where(mask, score, -jnp.inf)
    _, idx = jax.lax.top_k(s, capacity)
    keep = mask[idx]
    return Cloud(
        xyz=cloud.xyz[idx],
        intensity=cloud.intensity[idx],
        valid=keep,
    )
