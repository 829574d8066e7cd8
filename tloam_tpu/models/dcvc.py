"""Dynamic Curved-Voxel Clustering (DCVC) — parallel connected components.

TPU-native replacement for the reference's sequential DCVC segmentation
(reference: src/models/segmentation/segmentation.cpp:777-1112). The reference
hashes points into curved voxels (polar/pitch/azimuth) with an unordered_map
and runs a sequential label-propagation loop whose merge step rescans ALL
labels (worst case O(N·labels), segmentation.cpp:960-963). Here the same
curved-voxel graph is built with sort/segment ops and connected components
are solved by iterative min-label propagation + pointer jumping over voxels —
a parallel hooking/compression CC — inside one jitted while_loop.

Reference geometry reproduced exactly:
  * polar coords (r, pitch deg, azimuth deg in [0,360)) with gates
    r in (sensor_min_range, sensor_max_range) (:791-822).
  * dynamic radial bin widths startR - step*deltaR accumulated from the
    minimum observed radius (:829-836).
  * pitch index round((pitch - minPitch)/deltaP), azimuth index
    round(azimuth/deltaA) (:855-857).
  * 26-connected neighborhood with the reference's azimuth clamp quirk:
    ax < 0 -> width-1, ax > 300 -> 300 (searchKNN :884-905).
  * clusters with <= min_seg points dropped; survivors ranked by size
    descending, labels 1..K (labelAnalysis :995-1025).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tloam_tpu.cloud import Cloud
from tloam_tpu.config import DCVCConfig, SensorConfig

_P1, _P2, _P3 = 73856093, 19349663, 83492791
_SENT = jnp.iinfo(jnp.int32).max
_POLAR_CAP = 512  # static cap on radial bins (~400 used for 120 m range)


def _hash3(c: jax.Array) -> jax.Array:
    return c[..., 0] * _P1 + c[..., 1] * _P2 + c[..., 2] * _P3


def _hash3b(cx: jax.Array, cy: jax.Array, cz: jax.Array) -> jax.Array:
    """Independent secondary hash for collision rejection."""
    return (
        cx * jnp.int32(0x9E3779B1 & 0x7FFFFFFF)
        + cy * jnp.int32(0x85EBCA77 & 0x7FFFFFFF)
        + cz * jnp.int32(0xC2B2AE3D & 0x7FFFFFFF)
    )


class DCVCResult(NamedTuple):
    labels: jax.Array  # (N,) int32 cluster rank 1..K per point, 0 = dropped
    segmented: Cloud  # input cloud masked to clustered points
    box_min: jax.Array  # (K,3) cluster AABB minima
    box_max: jax.Array  # (K,3)
    box_valid: jax.Array  # (K,)
    num_clusters: jax.Array  # ()


def curved_voxel_coords(
    cloud: Cloud, cfg: DCVCConfig, sensor: SensorConfig
) -> tuple[jax.Array, jax.Array]:
    """Per-point curved-voxel integer coords (azimuth, polar, pitch) and the
    in-range validity mask."""
    xyz = cloud.xyz
    r = jnp.linalg.norm(xyz, axis=-1)
    safe_r = jnp.maximum(r, 1e-9)
    pitch = jnp.degrees(jnp.arcsin(jnp.clip(xyz[:, 2] / safe_r, -1.0, 1.0)))
    azim = jnp.degrees(jnp.arctan2(xyz[:, 1], xyz[:, 0]))
    azim = jnp.where(azim < 0.0, azim + 360.0, azim)

    ok = cloud.valid & (r < sensor.sensor_max_range) & (r > sensor.sensor_min_range)

    big = jnp.asarray(jnp.inf, xyz.dtype)
    min_pitch = jnp.min(jnp.where(ok, pitch, big))
    min_polar = jnp.min(jnp.where(ok, r, big))
    min_pitch = jnp.where(jnp.isfinite(min_pitch), min_pitch, 0.0)
    min_polar = jnp.where(jnp.isfinite(min_polar), min_polar, 0.0)

    # dynamic radial bounds: bounds[k] = minPolar + sum_{s=1..k+1}(startR - s*deltaR)
    steps = jnp.arange(1, _POLAR_CAP + 1, dtype=xyz.dtype)
    widths = jnp.maximum(cfg.start_r - steps * cfg.delta_r, 1e-4)
    bounds = min_polar + jnp.cumsum(widths)
    polar_idx = jnp.searchsorted(bounds, r, side="right").astype(jnp.int32)
    polar_idx = jnp.minimum(polar_idx, _POLAR_CAP - 1)

    pitch_idx = jnp.round((pitch - min_pitch) / cfg.delta_p).astype(jnp.int32)
    azim_idx = jnp.round(azim / cfg.delta_a).astype(jnp.int32)
    coords = jnp.stack([azim_idx, polar_idx, pitch_idx], axis=-1)
    return coords, ok


def _voxelize(coords: jax.Array, ok: jax.Array, max_voxels: int):
    """Unique voxels (lexsorted) + per-point voxel index.

    Returns (vox_coords (V,3), vox_valid (V,), point_vox (N,) index into the
    voxel table or -1)."""
    n = coords.shape[0]
    c = jnp.where(ok[:, None], coords, _SENT)
    pkeys = jnp.where(ok, _hash3(c), _SENT)
    order = jnp.argsort(pkeys)  # single-pass; boundaries below use exact coords
    cs = c[order]
    ok_s = ok[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), jnp.any(cs[1:] != cs[:-1], axis=-1)]
    )
    seg = jnp.cumsum(first) - 1
    seg = jnp.where(ok_s, seg, max_voxels)  # invalid -> overflow bucket
    seg_c = jnp.minimum(seg, max_voxels)

    vox_coords = jnp.full((max_voxels + 1, 3), _SENT, jnp.int32)
    vox_coords = vox_coords.at[seg_c].set(jnp.where(ok_s[:, None], cs, _SENT))
    vox_valid = (
        jax.ops.segment_sum(ok_s.astype(jnp.int32), seg_c, num_segments=max_voxels + 1)
        > 0
    )[:max_voxels]
    vox_coords = vox_coords[:max_voxels]

    point_vox = jnp.full((n,), -1, jnp.int32)
    point_vox = point_vox.at[order].set(
        jnp.where(ok_s & (seg < max_voxels), seg_c, -1).astype(jnp.int32)
    )
    return vox_coords, vox_valid, point_vox


def _neighbor_offsets(width: int):
    """The reference's 27-neighborhood with its azimuth clamp quirk
    (searchKNN, segmentation.cpp:884-905). Returns offsets (27,3) to be
    applied to (azim, polar, pitch) coords; clamping applied by caller."""
    offs = [(a, p, h) for h in (-1, 0, 1) for p in (-1, 0, 1) for a in (-1, 0, 1)]
    return jnp.asarray(offs, jnp.int32)


def dcvc_segment(
    cloud: Cloud,
    cfg: DCVCConfig,
    sensor: SensorConfig,
    max_voxels: int = 16384,
    max_clusters: int = 128,
    cc_iters: int = 32,
) -> DCVCResult:
    """Cluster the non-ground cloud into objects (reference objectSegmentation,
    segmentation.cpp:1085-1112)."""
    coords, ok = curved_voxel_coords(cloud, cfg, sensor)
    vox_coords, vox_valid, point_vox = _voxelize(coords, ok, max_voxels)

    width = int(round(360.0 / cfg.delta_a)) + 1  # 301 for deltaA=1.2

    # hash table over voxels for neighbor lookup: direct-addressed table
    # (4 packed probes; see ops/voxel.py on why not searchsorted), double
    # hash instead of coord comparison (TPU minor-dim tiling).
    from tloam_tpu.ops.voxel import build_direct_table, direct_lookup

    keys = jnp.where(vox_valid, _hash3(vox_coords), _SENT)
    keys2 = jnp.where(
        vox_valid, _hash3b(vox_coords[:, 0], vox_coords[:, 1], vox_coords[:, 2]), 0
    )
    V = max_voxels
    dt = build_direct_table(keys, keys2, vox_valid, jnp.arange(V, dtype=jnp.int32))

    # neighbor cell coords as scalar (V,27) planes, azimuth clamp quirk:
    # ax<0 -> width-1; ax>300 -> 300 (searchKNN :897-900)
    offs = _neighbor_offsets(width)  # (27,3)
    ax = vox_coords[:, 0:1] + offs[None, :, 0]
    ax = jnp.where(ax < 0, width - 1, ax)
    ax = jnp.where(ax > 300, 300, ax)
    py = vox_coords[:, 1:2] + offs[None, :, 1]
    ph = vox_coords[:, 2:3] + offs[None, :, 2]
    # pitch/polar out-of-range neighbors simply won't match any voxel.

    nbr_hash = ax * _P1 + py * _P2 + ph * _P3
    nbr_hash2 = _hash3b(ax, py, ph)
    nfound, nrow, _ = direct_lookup(dt, nbr_hash, nbr_hash2)
    nbr_idx = jnp.where(nfound, nrow, -1)  # (V,27) voxel table idx

    # --- parallel connected components over voxels ---
    init_label = jnp.where(vox_valid, jnp.arange(V, dtype=jnp.int32), V - 1)

    # The reference's azimuth clamp creates DIRECTED edges at the 0/360 wrap
    # (cell 0 lists 300 as neighbor, but not vice versa); its sequential merge
    # is nonetheless bidirectional. We symmetrize: gather-min over out-edges
    # plus scatter-min pushing each label onto its neighbors.
    #
    # Fixed-trip fori_loop (not while_loop): a data-dependent `changed`
    # reduction per iteration forced XLA to place the loop state in scalar
    # memory, serializing the gathers (~30x slower); with pointer jumping the
    # label spread is superlinear, so cc_iters fixed rounds always converge.
    flat_tgt = jnp.where(nbr_idx >= 0, nbr_idx, V).reshape(-1)

    def cc_body(_, label):
        nl = jnp.where(nbr_idx >= 0, label[jnp.maximum(nbr_idx, 0)], V)
        gather_min = jnp.min(nl, axis=1)
        src = jnp.broadcast_to(label[:, None], nbr_idx.shape).reshape(-1)
        push_min = jax.ops.segment_min(src, flat_tgt, num_segments=V + 1)[:V]
        best = jnp.minimum(jnp.minimum(gather_min, push_min), label)
        best = jnp.where(vox_valid, best, label)
        # pointer jumping (path compression) x2
        best = best[best]
        best = best[best]
        return best

    label = jax.lax.fori_loop(0, cc_iters, cc_body, init_label)

    # --- cluster stats ---
    pts_per_vox = jax.ops.segment_sum(
        (point_vox >= 0).astype(jnp.int32),
        jnp.maximum(point_vox, 0),
        num_segments=V,
    ) * vox_valid
    root = label
    cluster_size = jax.ops.segment_sum(pts_per_vox, root, num_segments=V)

    point_root = jnp.where(point_vox >= 0, root[jnp.maximum(point_vox, 0)], -1)

    # keep clusters with size > min_seg, ranked by size desc (labelAnalysis)
    is_root = vox_valid & (jnp.arange(V) == root) & (cluster_size > cfg.min_seg)
    score = jnp.where(is_root, cluster_size, -1)
    top_size, top_root = jax.lax.top_k(score, max_clusters)
    box_valid = top_size > 0
    num_clusters = jnp.sum(box_valid)

    # rank lookup: root voxel -> 1..K
    rank_of_root = jnp.zeros((V,), jnp.int32)
    ranks = jnp.arange(1, max_clusters + 1, dtype=jnp.int32)
    rank_of_root = rank_of_root.at[jnp.where(box_valid, top_root, V - 1)].set(
        jnp.where(box_valid, ranks, 0), mode="drop"
    )
    labels = jnp.where(point_root >= 0, rank_of_root[jnp.maximum(point_root, 0)], 0)
    labels = jnp.where(cloud.valid, labels, 0)

    # --- AABBs per kept cluster ---
    BIG = jnp.asarray(1e30, cloud.xyz.dtype)
    lab0 = jnp.maximum(labels - 1, 0)
    in_cluster = labels > 0
    seg_min = jax.ops.segment_min(
        jnp.where(in_cluster[:, None], cloud.xyz, BIG),
        jnp.where(in_cluster, lab0, max_clusters),
        num_segments=max_clusters + 1,
    )[:max_clusters]
    seg_max = jax.ops.segment_max(
        jnp.where(in_cluster[:, None], cloud.xyz, -BIG),
        jnp.where(in_cluster, lab0, max_clusters),
        num_segments=max_clusters + 1,
    )[:max_clusters]

    segmented = cloud.mask(in_cluster)
    return DCVCResult(labels, segmented, seg_min, seg_max, box_valid, num_clusters)
