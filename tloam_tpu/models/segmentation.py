"""Ring estimation + multi-region ground segmentation.

TPU-native replacement for the reference's ``Segmentation`` ground path
(reference: src/models/segmentation/segmentation.cpp:174-770). The
sequential per-point scan loops and 4 std::async quadrant threads become
batched mask/scan/segment ops over the whole cloud:

  reference mechanism                          -> this module
  -------------------------------------------------------------------------
  quadrant wrap-around ring counter            lax cummax/cumsum associative
    (estimateRingsAndTimes2, :334-445)           scan over the point stream
  filterByHeight (:454-470)                    mask on z > mean_height
  fillSectionIndex 4x3 region lists (:507-542) per-point region id in [0,12)
  4 async segmentGroundThread iterative        all 12 regions fitted at once:
    plane fits (:626-731)                        segment-sum moments -> 12
                                                 weighted-axis plane fits per
                                                 iteration (lax.fori_loop)
  findBestPlane (:551-616)                     weighted_axis_plane (same
                                                 arithmetic, batched)

Reference behaviors reproduced exactly:
  * ring id increments on quadrant 4 -> 1 wrap of consecutive VALID points,
    saturating at sensor_model-1 (:368-372).
  * the height pre-filter threshold is mean(z) + 0.5 (groundRemove :745).
  * seeds come from every-10th region point (by region-local rank) inside
    [z >= -1.5*sensor_height, r in [min,max]] (:646-650); the 20 lowest give
    av_height and seeds are subsampled points with z < av_height + dis.
  * plane-fit iterations 0..maxIter-2 re-select members from every-5th
    region point within dis of the plane; the LAST iteration classifies ALL
    region points (ground vs vertical) (:676-707).
  * regions whose seed set has <= 3 points contribute NOTHING — their points
    appear in neither output (:668-669 `continue`) — reproduced by dropping.
  * ground-point intensity keeps only the fractional (time) part; vertical
    points keep ring+time (:695-698).
"""
from __future__ import annotations

from typing import NamedTuple

import dataclasses
import numpy as np

import jax
import jax.numpy as jnp

from tloam_tpu.cloud import Cloud
from tloam_tpu.config import GroundSegConfig, SensorConfig


# ---------------------------------------------------------------------------
# Ring estimation
# ---------------------------------------------------------------------------


def quadrant_of(x: jax.Array, y: jax.Array) -> jax.Array:
    """Reference quadrant numbering (segmentation.cpp:345-360): 1..4."""
    return jnp.where(
        (x > 0) & (y >= 0),
        1,
        jnp.where((x <= 0) & (y > 0), 2, jnp.where((x < 0) & (y <= 0), 3, 4)),
    ).astype(jnp.int32)


def estimate_rings(
    xyz: jax.Array, valid: jax.Array, sensor_model: int = 64
) -> tuple[jax.Array, jax.Array]:
    """HDL-64E ring id per point + masked mean height.

    The KITTI stream is azimuth-ordered per beam; a 4 -> 1 quadrant wrap
    between consecutive valid points starts the next beam
    (segmentation.cpp:362-377). Returns (ring (N,) int32, mean_height ()).
    """
    q = quadrant_of(xyz[:, 0], xyz[:, 1])
    n = q.shape[0]
    # previous VALID point's quadrant. Packing the quadrant into the low
    # bits of the scanned index makes ONE cummax deliver it directly —
    # the previous formulation's gather q[last_valid] cost 0.9 ms/frame at
    # 131k rows (TPU gathers pay per row; measured r5 HLO profile).
    idx = jnp.arange(n, dtype=jnp.int32)
    packed = jnp.where(valid, idx * 8 + q, -1)
    last_packed = jax.lax.cummax(packed)
    prev_packed = jnp.concatenate([jnp.asarray([-1], jnp.int32), last_packed[:-1]])
    prev_q = jnp.where(prev_packed >= 0, prev_packed & 7, 0)
    wrap = valid & (q == 1) & (prev_q == 4)
    ring = jnp.minimum(jnp.cumsum(wrap.astype(jnp.int32)), sensor_model - 1)
    m = valid.astype(xyz.dtype)
    mean_h = jnp.sum(xyz[:, 2] * m) / jnp.maximum(jnp.sum(m), 1.0)
    return ring, mean_h


# ---------------------------------------------------------------------------
# Region partition
# ---------------------------------------------------------------------------


def section_bounds(sensor: SensorConfig, g: GroundSegConfig) -> np.ndarray:
    """Radial section boundaries from the HDL ring-radius table — static,
    computed host-side at trace time (reference initSections,
    segmentation.cpp:174-223, including the +1.7 deg elevation jump at ring
    31 of the HDL-64E)."""
    num_sec = g.num_sec
    width = int(np.ceil(1.0 * sensor.sensor_model) / num_sec)
    boundary_idx = [width * (i + 1) - 1 for i in range(num_sec)]
    bounds = []
    angle = sensor.init_angle
    bi = 0
    for i in range(sensor.sensor_model):
        if sensor.sensor_model == 64 and i == 31:
            angle += 1.7
        if bi < len(boundary_idx) and i == boundary_idx[bi] and bi <= 3:
            theta = abs(angle / 180.0 * np.pi)
            if theta != 0 and i < sensor.sensor_model:
                bounds.append(sensor.sensor_height / np.tan(theta))
            else:
                bounds.append(sensor.sensor_max_range)
            bi += 1
        angle += sensor.vertical_res
    return np.asarray(bounds, np.float64)


def region_ids(
    xyz: jax.Array, bounds: jax.Array, num_sec: int
) -> jax.Array:
    """Per-point region id q*num_sec + s (reference fillSectionIndex,
    segmentation.cpp:507-542; quadrants from atan2(-y, x) in [0,360))."""
    x, y = xyz[:, 0], xyz[:, 1]
    r = jnp.sqrt(x * x + y * y)
    theta = jnp.degrees(jnp.arctan2(-y, x))
    theta = jnp.where(theta < 0, theta + 360.0, theta)
    quad = jnp.clip((theta / 90.0).astype(jnp.int32), 0, 3)
    # num_sec-1 boundary compares instead of searchsorted's binary-search
    # gather chain (bounds has 3 entries; compares are pure vector ops)
    sec = jnp.zeros(r.shape, jnp.int32)
    for b in range(bounds.shape[0]):
        sec = sec + (r >= bounds[b]).astype(jnp.int32)
    sec = jnp.minimum(sec, num_sec - 1)
    return quad * num_sec + sec


def _rank_in_region(member: jax.Array, region: jax.Array, num_regions: int) -> jax.Array:
    """Order-preserving rank of each point within its region (the reference's
    k / i loop indices over per-region compacted clouds)."""
    onehot = (region[None, :] == jnp.arange(num_regions, dtype=region.dtype)[:, None])
    onehot = onehot & member[None, :]
    ranks = jnp.cumsum(onehot.astype(jnp.int32), axis=1) - 1
    return jnp.sum(jnp.where(onehot, ranks, 0), axis=0)


def weighted_axis_plane(moments: jax.Array) -> jax.Array:
    """Batched reference plane fit (findBestPlane, segmentation.cpp:551-616;
    identical arithmetic to registration.cpp:303-368): weighted combination
    of the three axis-elimination direction candidates.

    moments: (..., 10) = [sx, sy, sz, sxx, sxy, sxz, syy, syz, szz, count].
    Returns plane (...,4) [nx, ny, nz, d] with |n| = 1 (zero if degenerate).
    """
    cnt = jnp.maximum(moments[..., 9], 1.0)
    cx, cy, cz = (moments[..., 0] / cnt, moments[..., 1] / cnt, moments[..., 2] / cnt)
    xx = moments[..., 3] / cnt - cx * cx
    xy = moments[..., 4] / cnt - cx * cy
    xz = moments[..., 5] / cnt - cx * cz
    yy = moments[..., 6] / cnt - cy * cy
    yz = moments[..., 7] / cnt - cy * cz
    zz = moments[..., 8] / cnt - cz * cz

    det_x = yy * zz - yz * yz
    ax_x = jnp.stack([det_x, xz * yz - xy * zz, xy * yz - xz * yy], axis=-1)
    det_y = xx * zz - xz * xz
    ax_y = jnp.stack([xz * yz - xy * zz, det_y, xy * xz - yz * xx], axis=-1)
    det_z = xx * yy - xy * xy
    ax_z = jnp.stack([xy * yz - xz * yy, xy * xz - yz * xx, det_z], axis=-1)

    w = jnp.zeros_like(ax_x)
    for ax, det in ((ax_x, det_x), (ax_y, det_y), (ax_z, det_z)):
        weight = det * det
        sgn = jnp.where(jnp.sum(w * ax, axis=-1) < 0.0, -1.0, 1.0)
        w = w + ax * (sgn * weight)[..., None]

    norm = jnp.linalg.norm(w, axis=-1, keepdims=True)
    n = jnp.where(norm > 0, w / jnp.maximum(norm, 1e-30), jnp.zeros_like(w))
    centroid = jnp.stack([cx, cy, cz], axis=-1)
    d = -jnp.sum(n * centroid, axis=-1)
    return jnp.concatenate([n, d[..., None]], axis=-1)


class GroundSegResult(NamedTuple):
    ground: Cloud  # intensity = time-only fractional part
    objects: Cloud  # vertical + high points, intensity = ring + time
    ring: jax.Array  # (N,) int32 ring id of every input slot
    planes: jax.Array  # (12,4) final region plane models (diagnostics)


def ground_remove(
    cloud: Cloud,
    sensor: SensorConfig,
    g: GroundSegConfig,
) -> GroundSegResult:
    """Multi-region ground extraction (reference groundRemove,
    segmentation.cpp:738-770). One jitted program; no host round trips."""
    xyz, inten, valid = cloud.xyz, cloud.intensity, cloud.valid
    dtype = xyz.dtype
    num_regions = g.quadrant * g.num_sec

    ring, mean_h = estimate_rings(xyz, valid, sensor.sensor_model)
    mean_h = mean_h + 0.5  # groundRemove: estimateRingsAndTimes2(...) + 0.5

    high = valid & (xyz[:, 2] > mean_h)
    candidate = valid & ~high

    bounds = jnp.asarray(section_bounds(sensor, g), dtype)
    region = region_ids(xyz, bounds, g.num_sec)

    r_norm = jnp.linalg.norm(xyz, axis=-1)
    rank = _rank_in_region(candidate, region, num_regions)

    # Region reductions as MXU matmuls: with only 12 regions, a one-hot
    # (N,12) mask matmul reads the data in ONE streaming pass instead of an
    # N-row scatter-add (TPU scatters pay ~1 ms per 131k rows; the matmul is
    # bandwidth-bound at ~0.05 ms). The one-hot is reused by every reduction
    # AND every per-point table lookup in this function (a (N,) gather from
    # a 12-row table costs ~0.6 ms at 131k rows; (N,12)@(12,K) is ~0.05 ms).
    region_oh = (region[:, None] == jnp.arange(num_regions)[None, :]).astype(dtype)

    def region_sum(cols: jax.Array) -> jax.Array:
        """(N,K) per-point values -> (12,K) per-region sums, on the MXU."""
        return jax.lax.dot_general(
            region_oh, cols, (((0,), (0,)), ((), ())),
            preferred_element_type=dtype,
        )

    def per_point(table: jax.Array) -> jax.Array:
        """(12,) or (12,K) region table -> per-point values via the MXU
        (replaces table[region] row gathers)."""
        return region_oh @ table.astype(dtype)

    # --- seed selection (segmentGroundThread :640-663) ---
    sub10 = (
        candidate
        & (rank % 10 == 0)
        & (xyz[:, 2] >= -1.5 * sensor.sensor_height)
        & (r_norm >= sensor.sensor_min_range)
        & (r_norm <= sensor.sensor_max_range)
    )
    z_by_region = jnp.where(
        sub10[None, :] & (region[None, :] == jnp.arange(num_regions)[:, None]),
        xyz[None, :, 2],
        jnp.inf,
    )  # (12, N)
    low_z, _ = jax.lax.top_k(-z_by_region, g.ground_seed_num)
    low_z = -low_z  # (12, seed_num) ascending-ish lowest values
    low_ok = jnp.isfinite(low_z)
    cnt = jnp.maximum(jnp.sum(low_ok, axis=1), 1)
    av_height = jnp.sum(jnp.where(low_ok, low_z, 0.0), axis=1) / cnt  # (12,)
    av_height = jnp.where(jnp.sum(low_ok, axis=1) > 0, av_height, 0.0)

    seed = sub10 & (xyz[:, 2] < per_point(av_height) + g.dis)
    cand_m = candidate.astype(dtype)
    pre = region_sum(
        jnp.concatenate(
            [
                seed[:, None].astype(dtype),
                cand_m[:, None],
                xyz * cand_m[:, None],
            ],
            axis=1,
        )
    )  # (12, 5): [seed_count, cand_count, sum_x, sum_y, sum_z]
    region_ok = pre[:, 0] > 3  # <=3 seeds: whole region dropped (:668)

    # --- iterative plane refinement ---
    # Two-pass centering: accumulate moments of (p - region_anchor) — raw
    # second moments cancel catastrophically in f32 for regions tens of
    # meters from the origin (see ops/voxel.anchored_window_moments).
    reg_cnt = jnp.maximum(pre[:, 1], 1.0)
    anchor = pre[:, 2:5] / reg_cnt[:, None]  # (12,3) fixed per-region anchors
    cxyz = xyz - per_point(anchor)  # centered coords (small)

    feats = jnp.concatenate(
        [
            cxyz,
            cxyz[:, 0:1] * cxyz[:, 0:1],
            cxyz[:, 0:1] * cxyz[:, 1:2],
            cxyz[:, 0:1] * cxyz[:, 2:3],
            cxyz[:, 1:2] * cxyz[:, 1:2],
            cxyz[:, 1:2] * cxyz[:, 2:3],
            cxyz[:, 2:3] * cxyz[:, 2:3],
            jnp.ones_like(cxyz[:, :1]),
        ],
        axis=1,
    )  # (N,10)

    def fit(member):
        m = member.astype(dtype)[:, None]
        moments = region_sum(feats * m)  # MXU, not scatter (see region_sum)
        return weighted_axis_plane(moments)  # (12,4) in centered coords

    hom = jnp.concatenate([cxyz, jnp.ones_like(cxyz[:, :1])], axis=1)

    def iter_body(i, carry):
        member, planes = carry
        planes = fit(member)
        dis = jnp.abs(jnp.sum(hom * per_point(planes), axis=-1))
        close = candidate & (dis < g.dis)
        # iters before the last re-select every 5th region point (:687-689)
        member_mid = close & (rank % 5 == 0)
        member_last = close
        new_member = jnp.where(i < g.max_iter - 1, member_mid, member_last)
        # freeze regions whose member set collapsed (<=3): keep old members
        n_new = region_sum(new_member[:, None].astype(dtype))[:, 0]
        keep_old = per_point(n_new <= 3) > 0.5
        member = jnp.where(keep_old, member, new_member)
        return member, planes

    planes0 = jnp.zeros((num_regions, 4), dtype)
    member, planes = jax.lax.fori_loop(0, g.max_iter, iter_body, (seed, planes0))
    # re-express region planes in world coords for diagnostics:
    # n.(p - a) + d_rel = 0  ->  d_world = d_rel - n.a
    planes = planes.at[:, 3].add(-jnp.sum(planes[:, :3] * anchor, axis=-1))

    ok_pp = per_point(region_ok) > 0.5
    ground_mask = member & ok_pp
    vertical_mask = candidate & ~member & ok_pp

    # estimateRingsAndTimes2 OVERWRITES intensity with the beam id
    # (segmentation.cpp:342-376); the HDL-64E path has no time fraction, so
    # ground intensity (frac part) is 0 and object intensity is the ring id.
    ground = Cloud(xyz=xyz, intensity=jnp.zeros_like(inten), valid=ground_mask)
    objects = Cloud(
        xyz=xyz, intensity=ring.astype(inten.dtype), valid=vertical_mask | high
    )
    return GroundSegResult(ground, objects, ring, planes)


def attach_ring_intensity(cloud: Cloud, ring: jax.Array) -> Cloud:
    """Pack ring + fractional time into intensity like the reference does
    (estimateRingsAndTimes2 stores the beam id in the intensity channel)."""
    frac = cloud.intensity - jnp.floor(cloud.intensity)
    return dataclasses.replace(cloud, intensity=ring.astype(cloud.intensity.dtype) + frac)
