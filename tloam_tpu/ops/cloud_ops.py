"""Extended point-cloud op family — C2 inventory parity.

Batched, masked TPU-native equivalents of the reference's PointCloud2 method
set (reference: src/open3d/PointCloud2.cpp). Each op notes its counterpart:

  uniform_downsample            UniformDownSample        (:478-488)
  random_downsample_ratio       RandomDownSample(ratio)  (:490-504)
  random_downsample_count       RandomDownSample(count)  (:506-549, Vitter A)
  voxel_downsample_and_trace    VoxelDownSampleAndTrace  (:405-476)
  remove_radius_outliers        RemoveRadiusOutliers     (:571-597)
  remove_statistical_outliers   RemoveStatisticalOutliers(:598-654)
  estimate_normals              EstimateNormals          (:1086-1117)
  orient_normals_towards        OrientNormalsToAlignWithDirection /
                                ...TowardsCameraLocation (:1118-1160)
  orient_normals_consistent     OrientNormalsConsistentTangentPlane
                                (Kruskal MST, :1019-1270) — host-side numpy
  cluster_dbscan                ClusterDBSCAN            (:1271-1350)
  segment_plane_ransac          SegmentPlane RANSAC      (:1398-1477)
  point_cloud_distance          ComputePointCloudDistance(:666-680 area)
  mahalanobis_distance          ComputeMahalanobisDistance (:681-691)
  nearest_neighbor_distance     ComputeNearestNeighborDistance (:692-702)

ConvexHull / HiddenPointRemoval (:703-768) are host-geometry utilities with
no TPU value; see `convex_hull` / `hidden_point_removal` (scipy, host-side).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tloam_tpu.cloud import Cloud
from tloam_tpu.ops import eig3, voxel


# ---------------------------------------------------------------------------
# Downsampling
# ---------------------------------------------------------------------------


def uniform_downsample(cloud: Cloud, every_k: int) -> Cloud:
    """Keep every k-th VALID point (by valid rank), like the reference's
    index-stride over the compacted cloud (:478-488)."""
    rank = jnp.cumsum(cloud.valid) - 1
    return cloud.mask(cloud.valid & (rank % every_k == 0))


def random_downsample_ratio(cloud: Cloud, ratio: float, key: jax.Array) -> Cloud:
    """Bernoulli subsample at `ratio` (:490-504 samples ratio*N indices)."""
    u = jax.random.uniform(key, (cloud.capacity,))
    return cloud.mask(u < ratio)


def random_downsample_count(cloud: Cloud, count: int, key: jax.Array) -> Cloud:
    """Exactly `count` uniformly-random valid points (the reference uses
    Vitter's Algorithm A for streaming sampling, :506-549; a masked top-k over
    random keys is the batched equivalent — same distribution)."""
    u = jax.random.uniform(key, (cloud.capacity,))
    u = jnp.where(cloud.valid, u, -1.0)
    _, idx = jax.lax.top_k(u, count)
    keep = jnp.zeros((cloud.capacity,), bool).at[idx].set(True)
    return cloud.mask(keep & cloud.valid)


def voxel_downsample_and_trace(
    cloud: Cloud, voxel_size: float, max_out: int
) -> tuple[Cloud, jax.Array]:
    """Voxel average + per-input-point voxel assignment trace (:405-476).

    Returns (downsampled Cloud, trace (N,) int32 index into the output for
    every input slot, -1 for invalid)."""
    xyz, inten, valid = cloud.xyz, cloud.intensity, cloud.valid
    coords = jnp.floor(xyz / voxel_size).astype(jnp.int32)
    coords = jnp.where(valid[:, None], coords, jnp.iinfo(jnp.int32).max)
    order = jnp.lexsort((coords[:, 2], coords[:, 1], coords[:, 0]))
    cs = coords[order]
    valid_s = valid[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), jnp.any(cs[1:] != cs[:-1], axis=-1)]
    )
    seg = jnp.cumsum(first) - 1
    seg = jnp.where(valid_s & (seg < max_out), seg, max_out)
    ones = (seg < max_out).astype(xyz.dtype)
    cnt = jax.ops.segment_sum(ones, seg, num_segments=max_out + 1)[:max_out]
    sx = jax.ops.segment_sum(xyz[order] * ones[:, None], seg, num_segments=max_out + 1)[:max_out]
    si = jax.ops.segment_sum(inten[order] * ones, seg, num_segments=max_out + 1)[:max_out]
    denom = jnp.maximum(cnt, 1.0)
    out = Cloud(xyz=sx / denom[:, None], intensity=si / denom, valid=cnt > 0)
    trace = jnp.full((cloud.capacity,), -1, jnp.int32)
    trace = trace.at[order].set(jnp.where(seg < max_out, seg, -1).astype(jnp.int32))
    return out, trace


# ---------------------------------------------------------------------------
# Outlier removal
# ---------------------------------------------------------------------------


def remove_radius_outliers(
    cloud: Cloud, nb_points: int, radius: float, max_per_cell: int = 16
) -> Cloud:
    """Drop points with fewer than nb_points neighbors within radius
    (:571-597). Neighbor counts include the point itself, like the KD query."""
    grid = voxel.build_hash_grid(cloud.xyz, cloud.valid, radius)
    k = max(nb_points + 1, 8)
    _, _, ok = voxel.query_knn(
        grid, cloud.xyz, cloud.valid, k=k, radius=radius, max_per_cell=max_per_cell
    )
    return cloud.mask(jnp.sum(ok, axis=-1) >= nb_points)


def remove_statistical_outliers(
    cloud: Cloud, nb_neighbors: int, std_ratio: float, max_per_cell: int = 16
) -> Cloud:
    """Drop points whose mean kNN distance exceeds global mean + std_ratio *
    std (:598-654). The reference uses pure kNN; we bound the search to a
    generous radius via the hash grid (4x the median spacing heuristic is
    approximated by an unbounded-radius large cell)."""
    # estimate a search radius from the bounding box density
    span = cloud.max_bound() - cloud.min_bound()
    vol = jnp.maximum(jnp.prod(span), 1e-9)
    n = jnp.maximum(cloud.count(), 1)
    r = 4.0 * jnp.cbrt(vol / n)
    grid = voxel.build_hash_grid(cloud.xyz, cloud.valid, r)
    _, dist_sq, ok = voxel.query_knn(
        grid, cloud.xyz, cloud.valid, k=nb_neighbors + 1, radius=r,
        max_per_cell=max_per_cell,
    )
    # drop self (distance 0 slot)
    d = jnp.sqrt(jnp.where(ok, dist_sq, 0.0))
    found = jnp.sum(ok, axis=-1) - 1
    cnt = jnp.maximum(found, 1)
    mean_d = jnp.sum(d, axis=-1) / cnt
    # a point that cannot even FIND nb_neighbors within the generous radius
    # is an outlier by construction (the reference's unbounded kNN would
    # measure a huge distance for it) — and must not pollute the statistics.
    measurable = cloud.valid & (found >= nb_neighbors)
    mu = jnp.sum(jnp.where(measurable, mean_d, 0.0)) / jnp.maximum(
        jnp.sum(measurable), 1
    )
    var = jnp.sum(jnp.where(measurable, (mean_d - mu) ** 2, 0.0)) / jnp.maximum(
        jnp.sum(measurable) - 1, 1
    )
    thresh = mu + std_ratio * jnp.sqrt(var)
    return cloud.mask(measurable & (mean_d <= thresh))


# ---------------------------------------------------------------------------
# Normals
# ---------------------------------------------------------------------------


def estimate_normals(
    cloud: Cloud, radius: float = 0.1, max_nn: int = 30, max_per_cell: int = 16
) -> Cloud:
    """PCA normals over hybrid-search neighborhoods (:1086-1117)."""
    grid = voxel.build_hash_grid(cloud.xyz, cloud.valid, radius)
    idx, _, ok = voxel.query_knn(
        grid, cloud.xyz, cloud.valid, k=max_nn, radius=radius,
        max_per_cell=max_per_cell,
    )
    pts = cloud.xyz[idx]
    n, _, _ = eig3.plane_from_points(pts, ok)
    return dataclasses.replace(cloud, normals=n)


def orient_normals_towards(cloud: Cloud, reference_point: jax.Array) -> Cloud:
    """Flip normals to face a viewpoint (OrientNormalsTowardsCameraLocation,
    :1145-1160)."""
    assert cloud.normals is not None
    to_cam = reference_point - cloud.xyz
    sign = jnp.sign(jnp.sum(cloud.normals * to_cam, axis=-1, keepdims=True))
    sign = jnp.where(sign == 0, 1.0, sign)
    return dataclasses.replace(cloud, normals=cloud.normals * sign)


def orient_normals_direction(cloud: Cloud, direction: jax.Array) -> Cloud:
    """OrientNormalsToAlignWithDirection (:1118-1132)."""
    assert cloud.normals is not None
    sign = jnp.sign(jnp.sum(cloud.normals * direction, axis=-1, keepdims=True))
    sign = jnp.where(sign == 0, 1.0, sign)
    return dataclasses.replace(cloud, normals=cloud.normals * sign)


def orient_normals_consistent(cloud_np_xyz: np.ndarray, normals: np.ndarray, k: int = 10):
    """Consistent tangent-plane orientation via a minimum spanning tree
    (reference Kruskal/DisjointSet, :773-1270). Host-side numpy: MST over
    kNN graph weighted by 1-|n_i . n_j|, BFS sign propagation from the
    highest point. Returns oriented normals (numpy)."""
    from scipy.spatial import cKDTree

    n_pts = len(cloud_np_xyz)
    tree = cKDTree(cloud_np_xyz)
    _, nbrs = tree.query(cloud_np_xyz, k=min(k + 1, n_pts))
    edges = []
    for i in range(n_pts):
        for j in nbrs[i][1:]:
            w = 1.0 - abs(float(normals[i] @ normals[j]))
            edges.append((w, i, int(j)))
    edges.sort()
    parent = list(range(n_pts))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    mst = [[] for _ in range(n_pts)]
    for w, i, j in edges:
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[ri] = rj
            mst[i].append(j)
            mst[j].append(i)
    out = normals.copy()
    root = int(np.argmax(cloud_np_xyz[:, 2]))
    if out[root, 2] < 0:
        out[root] = -out[root]
    seen = np.zeros(n_pts, bool)
    stack = [root]
    seen[root] = True
    while stack:
        i = stack.pop()
        for j in mst[i]:
            if not seen[j]:
                seen[j] = True
                if out[i] @ out[j] < 0:
                    out[j] = -out[j]
                stack.append(j)
    return out


# ---------------------------------------------------------------------------
# Clustering / model fitting
# ---------------------------------------------------------------------------


def cluster_dbscan(
    cloud: Cloud, eps: float, min_points: int, max_per_cell: int = 16,
    cc_iters: int = 64,
) -> jax.Array:
    """DBSCAN labels (:1271-1350): core points have >= min_points neighbors
    within eps (self included, like Open3D); clusters are connected
    components of core points; border points adopt a neighboring core's
    label; noise = -1. Returns (N,) int32 labels (compacted, size-ordered
    tie-broken by min point index)."""
    n = cloud.capacity
    grid = voxel.build_hash_grid(cloud.xyz, cloud.valid, eps)
    k = max(min_points + 4, 16)
    idx, _, ok = voxel.query_knn(
        grid, cloud.xyz, cloud.valid, k=k, radius=eps, max_per_cell=max_per_cell
    )
    deg = jnp.sum(ok, axis=-1)
    core = cloud.valid & (deg >= min_points)

    # CC over core-core edges by min-label propagation + pointer jumping
    nbr = jnp.where(ok & core[idx] & core[:, None], idx, n)
    label0 = jnp.where(core, jnp.arange(n, dtype=jnp.int32), n - 1)
    flat_tgt = nbr.reshape(-1)
    src_rep = lambda lab: jnp.broadcast_to(lab[:, None], nbr.shape).reshape(-1)

    def body(state):
        lab, _, it = state
        gathered = jnp.where(nbr < n, lab[jnp.minimum(nbr, n - 1)], n)
        gmin = jnp.min(gathered, axis=-1)
        push = jax.ops.segment_min(src_rep(lab), flat_tgt, num_segments=n + 1)[:n]
        best = jnp.minimum(jnp.minimum(gmin, push), lab)
        best = jnp.where(core, best, lab)
        best = best[best]
        best = best[best]
        return best, jnp.any(best != lab), it + 1

    label, _, _ = jax.lax.while_loop(
        lambda s: s[1] & (s[2] < cc_iters),
        body,
        (label0, jnp.asarray(True), jnp.asarray(0, jnp.int32)),
    )

    # border points: adopt the minimum core neighbor's root
    core_nbr = jnp.where(ok & core[idx], label[idx], n)
    border_lab = jnp.min(core_nbr, axis=-1)
    pt_root = jnp.where(core, label, jnp.where(border_lab < n, border_lab, -1))
    pt_root = jnp.where(cloud.valid, pt_root, -1)

    # compact roots to 0..K-1
    is_root = core & (label == jnp.arange(n))
    root_rank = jnp.cumsum(is_root) - 1
    labels = jnp.where(pt_root >= 0, root_rank[jnp.maximum(pt_root, 0)], -1)
    return labels.astype(jnp.int32)


def segment_plane_ransac(
    cloud: Cloud,
    distance_threshold: float,
    ransac_n: int,
    num_iterations: int,
    key: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """RANSAC plane fit (:1398-1477): all hypotheses evaluated as one batch.

    Returns (plane (4,) [n,d], inlier_mask (N,))."""
    n = cloud.capacity
    del ransac_n  # 3-point minimal sample, as the reference uses
    # sample num_iterations triples of valid points
    valid_idx_p = cloud.valid / jnp.maximum(jnp.sum(cloud.valid), 1)
    tri = jax.random.choice(
        key, n, shape=(num_iterations, 3), p=valid_idx_p, replace=True
    )
    p0, p1, p2 = (cloud.xyz[tri[:, i]] for i in range(3))
    nrm = jnp.cross(p1 - p0, p2 - p0)
    nn = jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm = nrm / jnp.maximum(nn, 1e-12)
    d = -jnp.sum(nrm * p0, axis=-1)
    dist = jnp.abs(
        jnp.einsum("hi,ni->hn", nrm, cloud.xyz) + d[:, None]
    )  # (H,N)
    inl = (dist < distance_threshold) & cloud.valid[None, :] & (nn[:, 0] > 1e-9)[:, None]
    scores = jnp.sum(inl, axis=-1)
    best = jnp.argmax(scores)
    # refine on the best hypothesis' inliers with the LSQ plane
    mask = inl[best]
    nr, dr, _ = eig3.plane_from_points(cloud.xyz, mask)
    dist_r = jnp.abs(jnp.sum(nr * cloud.xyz, axis=-1) + dr)
    inlier_mask = (dist_r < distance_threshold) & cloud.valid
    plane = jnp.concatenate([nr, dr[None]])
    return plane, inlier_mask


# ---------------------------------------------------------------------------
# Distances
# ---------------------------------------------------------------------------


def point_cloud_distance(
    source: Cloud, target: Cloud, radius: float = 2.0, max_per_cell: int = 16
) -> jax.Array:
    """Per-source-point distance to the nearest target point (:666-680
    style). Points with no neighbor within `radius` get +inf."""
    grid = voxel.build_hash_grid(target.xyz, target.valid, radius)
    _, dist_sq, ok = voxel.query_knn(
        grid, source.xyz, source.valid, k=1, radius=radius, max_per_cell=max_per_cell
    )
    return jnp.where(ok[:, 0], jnp.sqrt(dist_sq[:, 0]), jnp.inf)


def mahalanobis_distance(cloud: Cloud) -> jax.Array:
    """Per-point Mahalanobis distance to the cloud's own distribution
    (:681-691)."""
    mean, cov = cloud.mean_and_covariance()
    prec = jnp.linalg.inv(cov + 1e-12 * jnp.eye(3, dtype=cov.dtype))
    diff = cloud.xyz - mean
    d2 = jnp.einsum("ni,ij,nj->n", diff, prec, diff)
    return jnp.where(cloud.valid, jnp.sqrt(jnp.maximum(d2, 0.0)), 0.0)


def nearest_neighbor_distance(
    cloud: Cloud, radius: float = 2.0, max_per_cell: int = 16
) -> jax.Array:
    """Distance to each point's nearest OTHER point (:692-702)."""
    grid = voxel.build_hash_grid(cloud.xyz, cloud.valid, radius)
    _, dist_sq, ok = voxel.query_knn(
        grid, cloud.xyz, cloud.valid, k=2, radius=radius, max_per_cell=max_per_cell
    )
    # slot 0 is self (distance ~0); slot 1 the true neighbor
    return jnp.where(ok[:, 1], jnp.sqrt(dist_sq[:, 1]), jnp.inf)


# ---------------------------------------------------------------------------
# Host-side hull utilities
# ---------------------------------------------------------------------------


def convex_hull(xyz: np.ndarray):
    """ConvexHull (:703-720) — host scipy."""
    from scipy.spatial import ConvexHull as _CH

    hull = _CH(xyz)
    return hull.vertices, hull.simplices


def hidden_point_removal(xyz: np.ndarray, camera: np.ndarray, radius: float):
    """Katz spherical-flip hidden point removal (:721-768) — host scipy."""
    p = xyz - camera
    norm = np.linalg.norm(p, axis=1, keepdims=True)
    flipped = p + 2 * (radius - norm) * (p / np.maximum(norm, 1e-12))
    pts = np.vstack([flipped, np.zeros(3)])
    verts, _ = convex_hull(pts)
    visible = verts[verts < len(xyz)]
    return np.sort(visible)
