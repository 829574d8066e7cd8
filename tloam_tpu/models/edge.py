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

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tloam_tpu.cloud import Cloud

# test hook: force the Pallas path in interpreter mode on CPU (parity tests)
_PALLAS_INTERPRET = bool(os.environ.get("TLOAM_PALLAS_INTERPRET"))


# ---------------------------------------------------------------------------
# Pallas kernel: ring geometry + all greedy pick rounds in VMEM
# ---------------------------------------------------------------------------
#
# The 20 pick rounds are sequential by construction (each pick suppresses
# neighbors before the next), so XLA runs them as ~600 small HBM-roundtrip
# fusions over the (R, W) matrices. The whole working set is <1 MB — one
# Pallas program per 8-ring tile keeps every round's state in VMEM and runs
# the full greedy loop at VPU speed. The ring GEOMETRY (11-tap smoothness,
# adjacent gaps, sector ids) is fused into the same kernel: its ~35 lane
# rolls are register-resident there, replacing the same count of flat
# HBM-roundtrip rolls over the point buffer.


def _dense_geometry(
    xs, ys, zs, vmask, lenr, *, num_sectors, ring_min_num
):
    """Per-ring geometry on the dense (rings, W) layout (works both inside
    a Pallas kernel — Mosaic lane rolls — and as plain XLA, see pltpu_roll).

    xs/ys/zs: (r, W) point coords at column = position-in-ring (0 where
    empty); vmask: 1.0 where a real point; lenr: (r, 1) ring lengths.
    Returns (dcurv (r,W) smoothness with -1 at non-candidates,
    gap_ok (r,W) f32 chain-gap gate, dsec (r,W) int32 sector or -1)."""
    r, W = xs.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (r, W), 1)
    leni = lenr.astype(jnp.int32)
    interior = (
        (vmask > 0.5)
        & (col >= 5)
        & (col < leni - 5)
        & (leni >= ring_min_num)
    )
    # 11-point smoothness, same accumulation order as the reference loop
    # (k = -5..5 skipping 0) for bit-identical f32 results across paths
    accx, accy, accz = -10.0 * xs, -10.0 * ys, -10.0 * zs
    for k in range(-5, 6):
        if k != 0:
            accx = accx + pltpu_roll(xs, -k)
            accy = accy + pltpu_roll(ys, -k)
            accz = accz + pltpu_roll(zs, -k)
    curv = accx * accx + accy * accy + accz * accz
    dcurv = jnp.where(interior, curv, -1.0)
    # gap to the NEXT ring position; empty neighbors sit at the origin and
    # every real point is >= the sensor near range away, so their "gap"
    # always fails the <= 0.05 chain gate, exactly like the sparse BIGG fill
    gx = pltpu_roll(xs, -1) - xs
    gy = pltpu_roll(ys, -1) - ys
    gz = pltpu_roll(zs, -1) - zs
    gap = gx * gx + gy * gy + gz * gz
    total = jnp.maximum(leni - 10, 1)
    dsec = jnp.where(
        interior,
        jnp.clip((num_sectors * (col - 5)) // total, 0, num_sectors - 1),
        -1,
    )
    return dcurv, gap, dsec


def _pick_kernel(
    x_ref, y_ref, z_ref, v_ref, len_ref, edge_ref, picked_ref,
    *, num_sectors, picks_per_sector, curv_thres, suppress_gap_sq,
    ring_min_num
):
    # The suppression chains live as f32 0/1 masks: Mosaic's lane rotate
    # only handles 32-bit data, and f32 multiply/max implement AND/OR.
    dcurv, gap, dsec = _dense_geometry(
        x_ref[:], y_ref[:], z_ref[:], v_ref[:], len_ref[:, 0:1],
        num_sectors=num_sectors, ring_min_num=ring_min_num,
    )
    gapf = (gap <= suppress_gap_sq).astype(jnp.float32)
    tile_r, W = dcurv.shape
    NEG = jnp.float32(-1.0)
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_r, W), 1)
    not_first = (col != 0).astype(jnp.float32)
    not_last = (col != W - 1).astype(jnp.float32)

    availf = (dcurv > NEG).astype(jnp.float32)
    edge_f = jnp.zeros((tile_r, W), jnp.float32)
    picked_f = jnp.zeros((tile_r, W), jnp.float32)

    for _ in range(picks_per_sector):
        cand = jnp.where((availf > 0.5) & (dcurv > curv_thres), dcurv, NEG)
        onehot = jnp.zeros((tile_r, W), jnp.float32)
        for s in range(num_sectors):
            cand_s = jnp.where(dsec == s, cand, NEG)
            mx = jnp.max(cand_s, axis=1, keepdims=True)
            arg = jnp.argmax(cand_s, axis=1)  # first max = scan order
            hit = ((col == arg[:, None]) & (mx > 0)).astype(jnp.float32)
            onehot = jnp.maximum(onehot, hit)
        edge_f = jnp.maximum(edge_f, onehot)
        sup = onehot
        chain_r = onehot
        chain_l = onehot
        for _k in range(5):
            # right: position j+1 suppressed if chain alive at j AND gap j ok
            chain_r = pltpu_roll(chain_r * gapf, 1) * not_first
            chain_l = pltpu_roll(chain_l, -1) * not_last * gapf
            sup = jnp.maximum(sup, jnp.maximum(chain_r, chain_l))
        picked_f = jnp.maximum(picked_f, sup)
        availf = availf * (1.0 - picked_f)

    edge_ref[:] = edge_f
    picked_ref[:] = picked_f


def pltpu_roll(a, shift):
    """Lane roll (axis 1) that also works in interpret/CPU mode."""
    from jax.experimental.pallas import tpu as pltpu

    try:
        return pltpu.roll(a, shift, 1)
    except Exception:
        return jnp.roll(a, shift, axis=1)


@partial(
    jax.jit,
    static_argnames=(
        "num_sectors", "picks_per_sector", "curv_thres", "suppress_gap_sq",
        "ring_min_num", "interpret",
    ),
)
def _pick_rounds_pallas(
    dx_, dy_, dz_, dval, lenr,
    num_sectors, picks_per_sector, curv_thres, suppress_gap_sq,
    ring_min_num, interpret=False,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, W = dx_.shape
    tile_r = 8
    kern = partial(
        _pick_kernel,
        num_sectors=num_sectors,
        picks_per_sector=picks_per_sector,
        curv_thres=curv_thres,
        suppress_gap_sq=suppress_gap_sq,
        ring_min_num=ring_min_num,
    )
    spec = pl.BlockSpec((tile_r, W), lambda i: (i, 0), memory_space=pltpu.VMEM)
    lspec = pl.BlockSpec((tile_r, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    edge_f, picked_f = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((R, W), jnp.float32),
            jax.ShapeDtypeStruct((R, W), jnp.float32),
        ),
        grid=(R // tile_r,),
        in_specs=[spec, spec, spec, spec, lspec],
        out_specs=(spec, spec),
        interpret=interpret,
    )(dx_, dy_, dz_, dval, lenr)
    return edge_f > 0.5, picked_f > 0.5


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
    # packed (N,6) row-take: xyz + valid + ring (TPU gathers pay per row)
    ps = jnp.take(
        jnp.concatenate(
            [
                cloud.xyz,
                valid[:, None].astype(dtype),
                ring_k[:, None].astype(dtype),
            ],
            axis=1,
        ),
        order,
        axis=0,
    )
    xyz_s = ps[:, :3]
    valid_s = ps[:, 3] > 0.5
    ring_s = ps[:, 4].astype(jnp.int32)

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

    interior = (
        valid_s
        & (ring_s < sensor_model)
        & (my_len >= ring_min_num)
        & (pos >= 5)
        & (pos < my_len - 5)
    )

    # --- dense (ring, position) layout ---
    # The flat formulation needs a segment-argmax (segment_max + segment_min
    # scatters over 131k) plus a onehot scatter EVERY round — ~67 ms/frame on
    # TPU. Scattering the RAW RING POINTS once into a (rings, W) matrix makes
    # everything downstream — 11-tap smoothness, gaps, sectors, and all pick
    # rounds — pure (R, W) vector work (fused into one Pallas kernel on TPU),
    # and row isolation makes ring-boundary handling exact.
    # Every dense op scales with W — size it just above the sensor's real
    # per-ring return count (KITTI HDL-64 ~2200/ring; synthetic 1870);
    # positions beyond W-1 are dropped from candidacy (never mis-picked).
    W = ring_width
    R = sensor_model
    in_dense = valid_s & (ring_s < R) & (pos < W)
    dslot = jnp.where(in_dense, ring_s * W + jnp.minimum(pos, W - 1), R * W)
    # ONE packed (N,4) row-scatter of [x, y, z, occupied]
    dense4 = jnp.zeros((R * W + 1, 4), dtype).at[dslot].set(
        jnp.where(
            in_dense[:, None],
            jnp.concatenate([xyz_s, jnp.ones((n, 1), dtype)], axis=1),
            0.0,
        ),
        mode="drop",
    )[: R * W]
    dx_ = dense4[:, 0].reshape(R, W)
    dy_ = dense4[:, 1].reshape(R, W)
    dz_ = dense4[:, 2].reshape(R, W)
    dval = dense4[:, 3].reshape(R, W)
    lenr_col = jnp.zeros((R, 128), dtype).at[:, 0].set(
        ring_len[:R].astype(dtype)
    )
    # On TPU the geometry + greedy loop run as ONE Pallas kernel with every
    # round's state resident in VMEM (see _pick_kernel) — XLA otherwise
    # executes them as ~600 small HBM-roundtrip fusions. The XLA path below
    # shares the exact same _dense_geometry and stays as the CPU/fallback
    # implementation (bit-parity asserted in tests).
    if _PALLAS_INTERPRET or jax.default_backend() in ("tpu", "axon"):
        edge_d, picked_d = _pick_rounds_pallas(
            dx_, dy_, dz_, dval, lenr_col,
            num_sectors, picks_per_sector, curv_thres, suppress_gap_sq,
            ring_min_num, interpret=_PALLAS_INTERPRET,
        )
        dcurv = None
    else:
        dcurv, gap, dsec = _dense_geometry(
            dx_, dy_, dz_, dval, lenr_col[:, 0:1],
            num_sectors=num_sectors, ring_min_num=ring_min_num,
        )
        gap_ok = gap <= suppress_gap_sq
        NEG = jnp.asarray(-1.0, dtype)
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
                # position j+1 suppressed if chain alive at j AND gap j ok
                chain_r = shift_right(chain_r & gap_ok)
                chain_l = shift_left(chain_l) & gap_ok
                sup = sup | chain_r | chain_l
            picked_d = picked_d | sup
            avail = avail & ~picked_d
            return avail, edge_d, picked_d

        # UNROLLED rounds (no lax.scan): loop-carried (R,W) bool state placed
        # in scoped memory by XLA's TPU loop handling serializes the row
        # reductions (same effect as the DCVC CC loop, models/dcvc.py).
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

    # un-sort back to input slot order (curvature is diagnostics-only; it is
    # recovered from the dense plane when the XLA path computed one)
    if dcurv is not None:
        curv_s = jnp.maximum(dcurv.reshape(-1)[safe_slot], 0.0) * interior
    else:
        curv_s = jnp.zeros((n,), dtype)
    edge_mask = jnp.zeros((n,), bool).at[order].set(edge_mask_s)
    general_mask = jnp.zeros((n,), bool).at[order].set(general_mask_s)
    curvature = jnp.zeros((n,), dtype).at[order].set(curv_s)
    return EdgeResult(edge_mask, general_mask, curvature)
