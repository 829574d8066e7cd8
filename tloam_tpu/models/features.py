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


def matmul_histogram(key: jax.Array, n_bins: int, dtype=jnp.float32) -> jax.Array:
    """Histogram of int keys in [0, n_bins) (out-of-range ignored) as a
    two-factor one-hot MXU matmul instead of a scatter-add.

    TPU scatter-adds pay per input ROW (~0.4 ms at 49k rows, measured r5 HLO
    profile); factorizing bin = hi*128 + lo makes the count matrix
    count[hi, lo] = OH_hi^T @ OH_lo — a (H,N)@(N,128) matmul (~0.03 ms) plus
    two one-hot compares. n_bins must be a multiple of 128."""
    assert n_bins % 128 == 0, n_bins
    H = n_bins // 128
    ok = (key >= 0) & (key < n_bins)
    k = jnp.where(ok, key, 0)
    hi = (k >> 7).astype(jnp.int32)
    lo = (k & 127).astype(jnp.int32)
    oh_hi = (hi[:, None] == jnp.arange(H, dtype=jnp.int32)[None, :]) & ok[:, None]
    oh_lo = (lo[:, None] == jnp.arange(128, dtype=jnp.int32)[None, :]) & ok[:, None]
    counts = jax.lax.dot_general(
        oh_hi.astype(dtype), oh_lo.astype(dtype),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )  # (H, 128)
    return counts.reshape(n_bins).astype(jnp.int32)


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

    xs, ys, zs = voxel.gather_planes(cloud.xyz, idx)
    # center on the query point: raw-coordinate second moments cancel
    # catastrophically in f32 at map scale (see voxel.anchored_window_moments)
    xs = xs - cloud.xyz[:, 0:1]
    ys = ys - cloud.xyz[:, 1:2]
    zs = zs - cloud.xyz[:, 2:3]  # (N,K) each
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


def calculate_pca_info_cell(
    cloud: Cloud, cfg: FeatureConfig, max_cells: int = 65536
) -> PCAInfo:
    """Cell-aggregated PCA — the TPU-fast path (FeatureConfig.pca_mode
    "cell").

    Instead of a per-point kNN gather (the reference's KD-tree hybrid search,
    feature_extract.cpp:60-70, and our exact mode), points are binned into
    cells of pitch `radius`; second-order moment sums are segment-reduced per
    cell, each cell aggregates its 27-neighborhood (a (3r)^3 box window
    standing in for the radius-r ball), and every point inherits its cell's
    eigen-features. Cuts the dominant HBM gather traffic ~16x; classification
    agreement with the exact mode is asserted in tests, and odometry parity
    is measured at the pose level (SURVEY.md §hard-parts b).

    The local-max-cvr sphere gate becomes "cell cvr >= all neighbor cell
    cvrs"; neigh_idx/neigh_ok are not provided in this mode (empty)."""
    dtype = cloud.xyz.dtype
    n = cloud.capacity
    # Morton-block store: the 27-cell window costs 8 probe rows + 8 record
    # rows per cell instead of 27 + 27 (see voxel.BlockTable)
    bt = voxel.build_block_table(cloud.xyz, cloud.valid, cfg.radius, max_cells)

    # anchored moments: raw-coordinate E[x^2]-E[x]^2 cancels catastrophically
    # in f32 at map scale — see voxel.anchored_window_moments
    _, mw, cache = voxel.block_window_moments(
        cloud.xyz, cloud.valid, bt, cfg.radius
    )
    rows, found, parity = cache
    w_cnt, sx, sy, sz, mxx, mxy, mxz, myy, myz, mzz = mw
    cnt = jnp.maximum(w_cnt, 1.0)
    mx, my, mz = sx / cnt, sy / cnt, sz / cnt
    a00 = mxx / cnt - mx * mx
    a01 = mxy / cnt - mx * my
    a02 = mxz / cnt - mx * mz
    a11 = myy / cnt - my * my
    a12 = myz / cnt - my * mz
    a22 = mzz / cnt - mz * mz

    lam0, lam1, lam2 = eig3.eigvalsh3_soa(a00, a01, a02, a11, a12, a22)
    nx_, ny_, nz_ = eig3.eigvec_soa(a00, a01, a02, a11, a12, a22, lam0)
    lam_sum = lam0 + lam1 + lam2
    c_cvr = jnp.where(lam_sum > 0, lam0 / jnp.maximum(lam_sum, 1e-30), 0.0)
    lam_hi = jnp.maximum(lam2, 1e-30)
    c_flat = (lam1 - lam0) / lam_hi
    c_sph = lam0 / lam_hi
    # neighbor-local-max of cvr at the cell level (reuses the probe cache:
    # 8 row takes instead of a 27-way scalar gather)
    nbr_max = voxel.block_window_scalar_max(bt, c_cvr, rows, found, parity)
    c_localmax = c_cvr >= nbr_max

    # broadcast cell features to points: ONE 8-lane row take per point
    # instead of 8 scalar gathers (rows are what a TPU gather pays for)
    cell_rec = jnp.stack(
        [nx_, ny_, nz_, c_cvr, c_flat, c_sph, w_cnt,
         c_localmax.astype(dtype)],
        axis=1,
    )  # (V, 8)
    pc = jnp.maximum(bt.point_cell, 0)
    in_cell = bt.point_cell >= 0
    prec = jnp.take(cell_rec, pc, axis=0)  # (N, 8)
    m = in_cell.astype(dtype)[:, None]
    prec = prec * m
    normal = jnp.concatenate(
        [jnp.where(in_cell, prec[:, 0], 1.0)[:, None], prec[:, 1:3]], axis=1
    )
    cvr, flat, sph = prec[:, 3], prec[:, 4], prec[:, 5]
    n_neigh = prec[:, 6].astype(jnp.int32)
    has_info = cloud.valid & in_cell & (n_neigh > cfg.min_neigh)
    localmax_pt = in_cell & (prec[:, 7] > 0.5)
    return PCAInfo(
        normal, cvr, flat, sph, n_neigh, has_info,
        neigh_idx=jnp.zeros((n, 1), jnp.int32),
        neigh_ok=localmax_pt[:, None],
    )


def top_k_mask(score: jax.Array, cls: jax.Array, k: int, bins: int = 2048) -> jax.Array:
    """Mask of (about) the k highest-score points among `cls`, via a ONE-pass
    histogram threshold — replaces an O(N log N) TPU sort/top_k ("rank < k"
    becomes "score >= t_k"; ties inside the threshold bin are all kept, so
    the mask holds >= k points, exceeding k by at most one bin's ties)."""
    total = jnp.sum(cls)
    smax = jnp.max(jnp.where(cls, score, -jnp.inf))
    smin = jnp.min(jnp.where(cls, score, jnp.inf))
    lo = jnp.where(jnp.isfinite(smin), smin, 0.0)
    hi = jnp.where(jnp.isfinite(smax), smax, 1.0)
    width = jnp.maximum(hi - lo, 1e-12)

    b = jnp.clip(((score - lo) / width * bins).astype(jnp.int32), 0, bins - 1)
    b = jnp.where(cls, b, bins)  # out-of-range: ignored by matmul_histogram
    hist = matmul_histogram(b, bins)
    # number of points in bin >= t, per t
    from_top = jnp.cumsum(hist[::-1])[::-1]
    meets = from_top >= k
    bstar = jnp.max(jnp.where(meets, jnp.arange(bins), -1))
    thresh = lo + bstar.astype(score.dtype) * width / bins
    keep = cls & (score >= thresh) & (bstar >= 0)
    return jnp.where(total <= k, cls, keep)


def top_k_mask_segmented(
    score: jax.Array,
    cls: jax.Array,
    seg: jax.Array,
    n_seg: int,
    k: int,
    bins: int = 512,
) -> jax.Array:
    """Per-segment variant of `top_k_mask`: (about) the k highest-score
    points of `cls` WITHIN each segment (e.g. azimuth sector). One
    (n_seg x bins) histogram + per-row threshold; same tie semantics.

    Why: the reference keeps EVERY point above the scan threshold
    (feature_extract.cpp:171-189 — rank<num OR score>thres, unbounded), so
    its picks cover the whole scene. A fixed-capacity global top-k instead
    concentrates on the flattest (nearest) structure — e.g. a freshly
    revealed wall with no submap overlap, starving the solver. Sector
    stratification restores the reference's spatial breadth under a static
    capacity."""
    dtype = score.dtype
    smax = jnp.max(jnp.where(cls, score, -jnp.inf))
    smin = jnp.min(jnp.where(cls, score, jnp.inf))
    lo = jnp.where(jnp.isfinite(smin), smin, 0.0)
    hi = jnp.where(jnp.isfinite(smax), smax, 1.0)
    width = jnp.maximum(hi - lo, 1e-12)

    b = jnp.clip(((score - lo) / width * bins).astype(jnp.int32), 0, bins - 1)
    seg_c = jnp.clip(seg, 0, n_seg - 1)
    key = jnp.where(cls, seg_c * bins + b, n_seg * bins)
    hist = matmul_histogram(key, n_seg * bins).reshape(n_seg, bins)
    from_top = jnp.cumsum(hist[:, ::-1], axis=1)[:, ::-1]  # (n_seg, bins)
    meets = from_top >= k
    bstar = jnp.max(
        jnp.where(meets, jnp.arange(bins)[None, :], -1), axis=1
    )  # (n_seg,)
    thresh = lo + bstar.astype(dtype) * width / bins
    keep = cls & (score >= thresh[seg_c]) & (bstar[seg_c] >= 0)
    # if a segment holds <= k classified points, keep them all
    seg_tot = jnp.sum(hist, axis=1)
    return jnp.where(seg_tot[seg_c] <= k, cls, keep)


def azimuth_sectors(xyz: jax.Array, n_sectors: int) -> jax.Array:
    """Sensor-frame azimuth sector id per point, (N,) int32 in [0, n)."""
    az = jnp.arctan2(xyz[:, 1], xyz[:, 0])  # [-pi, pi]
    s = ((az + jnp.pi) / (2 * jnp.pi) * n_sectors).astype(jnp.int32)
    return jnp.clip(s, 0, n_sectors - 1)


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
    if cfg.pca_mode == "cell":
        pca = calculate_pca_info_cell(cloud, cfg, cfg.max_cells)
        local_max = pca.neigh_ok[:, 0]  # precomputed cell-level verdict
    else:
        pca = calculate_pca_info(cloud, cfg, max_per_cell)
        # local max of cvr across the point's own neighbor set
        neigh_cvr = jnp.where(pca.neigh_ok, pca.cvr[pca.neigh_idx], -jnp.inf)
        local_max = jnp.all(
            jnp.where(pca.neigh_ok, pca.cvr[:, None] >= neigh_cvr, True), axis=-1
        )
    n = cloud.capacity

    planar_cls = (
        pca.has_info
        & (pca.flatness > cfg.planar_submap_thres)
        & (jnp.abs(pca.normal[:, 2]) < cfg.planar_vertic_thres)
    )
    # sphere: else-branch (NOT planar), cvr over threshold, local max of cvr
    sphere_cls = (
        pca.has_info & ~planar_cls & (pca.cvr > cfg.cvr_submap) & local_max
    )

    planar_scan = planar_cls & (
        top_k_mask(pca.flatness, planar_cls, cfg.planar_num)
        | (pca.flatness > cfg.planar_scan_thres)
    )
    # scan sphere keeps the top sphere_num by flatness (the reference sorts
    # the sphere list by FLATNESS and compares against cvr_scan — quirks kept)
    sphere_top = top_k_mask(pca.flatness, sphere_cls, cfg.sphere_num)
    if sphere_index_bug:
        # bit-faithful reference bug: the selected "sphere" indices are the
        # RANKS, i.e. the first `count` slots of the input cloud.
        count = jnp.sum(sphere_cls)
        keep = jnp.minimum(
            count,
            jnp.sum(sphere_cls & (sphere_top | (pca.flatness > cfg.cvr_scan))),
        )
        sphere_scan = (jnp.arange(n) < keep) & cloud.valid
        sphere_submap = (jnp.arange(n) < count) & cloud.valid
    else:
        sphere_scan = sphere_cls & (sphere_top | (pca.flatness > cfg.cvr_scan))
        sphere_submap = sphere_cls
    return FeatureSelection(planar_scan, planar_cls, sphere_scan, sphere_submap, pca)


def gather_top(
    cloud: Cloud,
    mask: jax.Array,
    score: jax.Array,
    capacity: int,
    sectors: int = 0,
) -> Cloud:
    """Compact the masked points into a fixed-capacity Cloud, preferring the
    highest-score points when over capacity.

    Sort-free: a threshold bisection narrows the selection to <= capacity
    (plus threshold ties, resolved first-come), then a cumsum scatter
    compacts — O(N) instead of a big-k lax.top_k (which is a near-full sort
    on TPU).

    With `sectors` > 0 the top-(capacity/sectors) picks are made PER azimuth
    sector so the selection keeps the reference's whole-scene spatial breadth
    (see top_k_mask_segmented) instead of clustering on the flattest wall."""
    if sectors > 0:
        seg = azimuth_sectors(cloud.xyz, sectors)
        sel = top_k_mask_segmented(
            score, mask, seg, sectors, max(capacity // sectors, 1)
        )
    else:
        sel = top_k_mask(score, mask, capacity)
    rank = jnp.cumsum(sel) - 1
    ok = sel & (rank < capacity)
    slot = jnp.where(ok, rank, capacity)
    dtype = cloud.xyz.dtype
    # ONE packed (N,5) row-scatter — TPU scatter pays per row, not per
    # element, so [x,y,z,intensity,valid] in one scatter costs a third of
    # three separate ones
    vals = jnp.concatenate(
        [cloud.xyz, cloud.intensity[:, None], ok[:, None].astype(dtype)], axis=1
    )
    out = jnp.zeros((capacity + 1, 5), dtype).at[slot].set(vals)
    return Cloud(
        xyz=out[:capacity, :3],
        intensity=out[:capacity, 3],
        valid=out[:capacity, 4] > 0.5,
    )
