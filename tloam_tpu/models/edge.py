"""LOAM-style per-ring edge extraction with sector top-k + neighbor suppression.

TPU-native replacement for the reference's ``extractEdgePoint`` /
``extractFromSection`` (reference: src/models/segmentation/
segmentation.cpp:1144-1302). The reference splits the clustered cloud into 64
ring lists, computes an 11-point smoothness along each, splits each ring into
6 sectors and GREEDILY picks up to 20 highest-curvature points (> 0.1) per
sector, suppressing up to ±5 consecutive neighbors while the chain of
adjacent point gaps stays <= 0.05 (squared).

The greedy pick is inherently sequential PER PICK but parallel ACROSS the
384 (ring, sector) groups: interior candidates are scattered ONCE into a
dense (ring, position) matrix and `picks_per_sector` rounds of row-sector
argmax + shift-based chain suppression run as pure vector ops (no per-round
scatters). Everything is one jitted program on fixed shapes.

Behaviors reproduced:
  * ring sequences ordered as the reference sees them (cluster-major within
    ring — the caller passes sort keys accordingly).
  * curvature defined only for interior positions [5, len-5) (:1248-1284).
  * rings shorter than ring_min_num skipped entirely (:1242-1243).
  * sector partition over totalPoints = len-10 (:1287-1294).
  * curvature threshold 0.1, <=20 picks, ±5 suppression chain with squared
    gap 0.05 (:1154-1199).
  * points with no curvature slot (ring edges, short rings) appear in
    NEITHER output — they are dropped from the downstream general cloud.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tloam_tpu.cloud import Cloud


class EdgeResult(NamedTuple):
    edge_mask: jax.Array  # (N,) picked edge points (in input slot order)
    general_mask: jax.Array  # (N,) non-edge curvature-carrying points
    curvature: jax.Array  # (N,) smoothness value (0 where undefined)


def extract_edges(
    cloud: Cloud,
    ring: jax.Array,
    order_key: jax.Array,
    sensor_model: int = 64,
    ring_min_num: int = 131,
    num_sectors: int = 6,
    picks_per_sector: int = 20,
    curv_thres: float = 0.1,
    suppress_gap_sq: float = 0.05,
    ring_width: int = 4096,
) -> EdgeResult:
    """Extract edge features.

    Args:
      cloud: clustered object cloud (masked).
      ring: (N,) int32 ring id per slot.
      order_key: (N,) secondary sort key reproducing the reference's
        per-ring point order (e.g. cluster_rank * N + original_index).
    """
    n = cloud.capacity
    valid = cloud.valid
    dtype = cloud.xyz.dtype

    # ring-major stable ordering; invalid slots to the end
    ring_k = jnp.where(valid, ring, sensor_model + 1)
    order = jnp.lexsort((order_key, ring_k))
    xyz_s = cloud.xyz[order]
    valid_s = valid[order]
    ring_s = ring_k[order]

    # position within ring + ring lengths
    same = jnp.concatenate(
        [jnp.zeros((1,), bool), (ring_s[1:] == ring_s[:-1]) & valid_s[1:]]
    )
    # pos = index since last ring change
    idx = jnp.arange(n)
    ring_start = jnp.where(~same, idx, 0)
    ring_start = jax.lax.cummax(ring_start)
    pos = idx - ring_start
    ring_len = jax.ops.segment_sum(
        valid_s.astype(jnp.int32), jnp.minimum(ring_s, sensor_model),
        num_segments=sensor_model + 1,
    )
    my_len = ring_len[jnp.minimum(ring_s, sensor_model)]

    # 11-point smoothness: sum_{k=-5..5} p_k - 10 p_0 with the convention of
    # a contiguous ring segment; positions within [5, len-5) only.
    # SoA accumulation over (N,) planes — (N,3) roll temporaries would each
    # pad 3 -> 128 on TPU (see ops/voxel.py docstring).
    xs, ys, zs = xyz_s[:, 0], xyz_s[:, 1], xyz_s[:, 2]
    accx, accy, accz = -10.0 * xs, -10.0 * ys, -10.0 * zs
    for k in range(-5, 6):
        if k != 0:
            accx = accx + jnp.roll(xs, -k)
            accy = accy + jnp.roll(ys, -k)
            accz = accz + jnp.roll(zs, -k)
    curv = accx * accx + accy * accy + accz * accz

    interior = (
        valid_s
        & (ring_s < sensor_model)
        & (my_len >= ring_min_num)
        & (pos >= 5)
        & (pos < my_len - 5)
    )
    curv = jnp.where(interior, curv, 0.0)

    # sector id over totalPoints = len - 10, curvature positions j-5
    total_pts = jnp.maximum(my_len - 10, 1)
    sector = jnp.clip(
        (num_sectors * (pos - 5)) // total_pts, 0, num_sectors - 1
    )
    # adjacent-gap (squared) along the sorted order, within rings
    gx = jnp.roll(xs, -1) - xs
    gy = jnp.roll(ys, -1) - ys
    gz = jnp.roll(zs, -1) - zs
    nxt_gap = gx * gx + gy * gy + gz * gz

    # --- dense (ring, position) layout for the greedy pick rounds ---
    # The flat formulation needs a segment-argmax (segment_max + segment_min
    # scatters over 131k) plus a onehot scatter EVERY round — ~67 ms/frame on
    # TPU. Scattering the interior candidates ONCE into a (rings, W) matrix
    # turns each round into row reductions + static shifts (pure vector ops),
    # and row isolation makes ring-boundary chain handling exact (the flat
    # rolls could leak a chain across a ring boundary).
    # every pick-round op scales with W — size it just above the sensor's
    # real per-ring return count (KITTI HDL-64 ~2200/ring; synthetic 1870);
    # interior positions beyond W-1 collide on the last column and lose
    # their candidacy (never mis-pick)
    W = ring_width
    R = sensor_model
    drow = jnp.where(interior, ring_s, R)
    dcol = jnp.clip(pos - 5, 0, W - 1)
    dslot = jnp.where(interior & (pos - 5 < W), drow * W + dcol, R * W)

    NEG = jnp.asarray(-1.0, dtype)
    dcurv = jnp.full((R * W + 1,), NEG).at[dslot].set(
        jnp.where(interior, curv, NEG), mode="drop"
    )[: R * W].reshape(R, W)
    # gap from this interior position to the NEXT ring position; the last
    # interior slot's gap leads out of the interior — chains may still use it
    # only if the next position is also interior, which dense emptiness
    # (gap=inf at unscattered slots) handles via the shifted AND below.
    BIGG = jnp.asarray(jnp.finfo(dtype).max, dtype)
    dgap = jnp.full((R * W + 1,), BIGG).at[dslot].set(
        jnp.where(interior, nxt_gap, BIGG), mode="drop"
    )[: R * W].reshape(R, W)
    dsec = jnp.full((R * W + 1,), -1, jnp.int32).at[dslot].set(
        jnp.where(interior, sector, -1).astype(jnp.int32), mode="drop"
    )[: R * W].reshape(R, W)

    col_iota = jnp.arange(W, dtype=jnp.int32)[None, :]
    avail = dcurv > NEG
    edge_d = jnp.zeros((R, W), bool)
    picked_d = jnp.zeros((R, W), bool)

    def shift_right(a, fill=False):
        return jnp.concatenate(
            [jnp.full((R, 1), fill, a.dtype), a[:, :-1]], axis=1
        )

    def shift_left(a, fill=False):
        return jnp.concatenate(
            [a[:, 1:], jnp.full((R, 1), fill, a.dtype)], axis=1
        )

    gap_ok = dgap <= suppress_gap_sq

    def pick_round(state):
        avail, edge_d, picked_d = state
        cand = jnp.where(avail & (dcurv > curv_thres), dcurv, NEG)
        onehot = jnp.zeros((R, W), bool)
        for s in range(num_sectors):
            cand_s = jnp.where(dsec == s, cand, NEG)
            mx = jnp.max(cand_s, axis=1, keepdims=True)
            arg = jnp.argmax(cand_s, axis=1)  # first max = scan order
            onehot = onehot | ((col_iota == arg[:, None]) & (mx > 0))
        edge_d = edge_d | onehot
        sup = onehot
        chain_r = onehot
        chain_l = onehot
        for _k in range(5):
            # right: position j+1 suppressed if chain alive at j AND gap j ok
            chain_r = shift_right(chain_r & gap_ok)
            chain_l = shift_left(chain_l) & gap_ok
            sup = sup | chain_r | chain_l
        picked_d = picked_d | sup
        avail = avail & ~picked_d
        return avail, edge_d, picked_d

    # UNROLLED rounds (no lax.scan): loop-carried (R,W) bool state placed in
    # scoped memory by XLA's TPU loop handling serializes the row reductions
    # (same effect as the DCVC CC loop, models/dcvc.py) — unrolling keeps the
    # 20 rounds fully vectorized.
    state = (avail, edge_d, picked_d)
    for _ in range(picks_per_sector):
        state = pick_round(state)
    avail, edge_d, picked_d = state

    # back to the flat sorted order
    flat_edge = edge_d.reshape(-1)
    flat_picked = picked_d.reshape(-1)
    safe_slot = jnp.minimum(dslot, R * W - 1)
    edge_mask_s = interior & flat_edge[safe_slot]
    picked_s = interior & flat_picked[safe_slot]

    general_mask_s = interior & ~picked_s

    # un-sort back to input slot order
    edge_mask = jnp.zeros((n,), bool).at[order].set(edge_mask_s)
    general_mask = jnp.zeros((n,), bool).at[order].set(general_mask_s)
    curvature = jnp.zeros((n,), dtype).at[order].set(curv)
    return EdgeResult(edge_mask, general_mask, curvature)
