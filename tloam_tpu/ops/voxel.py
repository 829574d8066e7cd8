"""Voxel hashing: downsampling + the batched nearest-neighbor engine.

This module replaces BOTH of the reference's spatial-search mechanisms:
  * `VoxelDownSample` (reference PointCloud2.cpp:358-403) — here a fully
    batched sort/segment-mean, intensity-consistent like the reference.
  * the four per-feature-class `KDTreeFlann` trees + per-point SearchHybrid
    calls (reference registration.cpp:892-915, 444, 535, 588, 669, 731) —
    here a sorted spatial-hash grid queried for all points at once: 27
    neighbor cells are probed per query, up to `max_per_cell` candidates
    gathered from each, and the k best selected with `lax.top_k`.

TPU memory-layout notes (the reason for some non-obvious shapes):
  * TPU tiles the last TWO dims of every array to (8,128); a large array
    with a tiny minor dim (e.g. (Q,27,C,3)) pads 3 -> 128 and explodes 42x.
    All per-candidate data here therefore lives in (Q, 27*C) planes with the
    LARGE candidate axis minor, and point coordinates are gathered as three
    separate scalar planes (SoA) instead of one (...,3) tensor.
  * Hash-collision rejection uses a SECOND independent spatial hash instead
    of exact integer-coordinate comparison: a false match needs both 32-bit
    hashes to collide on different cells probed from the same sorted block —
    vanishing probability, and it removes the (...,3) coordinate tensors.
  * `chunk_size` runs the query in lax.map chunks to bound peak memory
    (used for the ~131k-point PCA self-query).

Approximation vs the reference's exact KD-tree hybrid search: only the first
`max_per_cell` points of a cell's sorted run are considered. With
voxel-downsampled feature maps the per-cell occupancy is small, so the top-k
within radius is exact in practice; parity is asserted at the *pose* level
(SURVEY.md §hard-parts b).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# Spatial-hash constants. LINEAR forms (wrapping ADD of odd-prime products),
# NOT XOR: an XOR hash of products is sign-symmetric — for odd products
# (-a)^(-b) == a^b, so cells (x,y,z) and (-x,-y,z) collide in EVERY
# XOR-of-products hash simultaneously, and LiDAR clouds are centered on the
# sensor where such cell pairs coexist. A linear form only collides on huge
# lattice vectors (~1e7 cells apart); two independent linear forms jointly
# never collide within any realistic grid.
_P1, _P2, _P3 = 73856093, 19349663, 83492791
_Q1, _Q2, _Q3 = 0x9E3779B1 & 0x7FFFFFFF, 0x85EBCA77 & 0x7FFFFFFF, 0xC2B2AE3D & 0x7FFFFFFF
_SENTINEL = jnp.iinfo(jnp.int32).max


def _cell_coords(points: jax.Array, cell_size) -> jax.Array:
    return jnp.floor(points / cell_size).astype(jnp.int32)


def _hash_coords(c: jax.Array) -> jax.Array:
    return c[..., 0] * _P1 + c[..., 1] * _P2 + c[..., 2] * _P3


def _hash2_coords(c: jax.Array) -> jax.Array:
    return _hash2_parts(c[..., 0], c[..., 1], c[..., 2])


def _hash2_parts(cx: jax.Array, cy: jax.Array, cz: jax.Array) -> jax.Array:
    return (
        cx * jnp.int32(_Q1) + cy * jnp.int32(_Q2) + cz * jnp.int32(_Q3)
    )


# ---------------------------------------------------------------------------
# Voxel downsample
# ---------------------------------------------------------------------------


def sort_with_payload(key: jax.Array, *cols: jax.Array):
    """Stable sort of `cols` by int `key` via ONE lax.sort with payload
    operands. Returns (sorted_key, sorted_cols...).

    Replaces the argsort-then-take idiom: a take at N rows costs ~1 ms per
    131k rows (TPU gathers pay per row, measured r5 HLO profile) while the
    sort network carries payload lanes nearly for free (~0.1 ms at the same
    size) — on TPU, sorting data is an order of magnitude cheaper than
    permuting it by index."""
    return jax.lax.sort((key, *cols), dimension=-1, is_stable=True, num_keys=1)


def unpermute(order_idx: jax.Array, *cols: jax.Array):
    """Given values `cols` aligned with a sorted order whose original indices
    are `order_idx`, return them in original-index order — via a second
    payload sort instead of an N-row scatter (same cost argument as
    sort_with_payload)."""
    out = jax.lax.sort((order_idx, *cols), dimension=-1, is_stable=True, num_keys=1)
    return out[1:] if len(cols) > 1 else out[1]


def voxel_downsample(
    xyz: jax.Array,
    intensity: jax.Array,
    valid: jax.Array,
    voxel_size: float,
    max_out: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Average points falling in each voxel (positions AND intensity, like the
    reference's intensity-aware VoxelDownSample, PointCloud2.cpp:358-403).

    Returns (xyz (max_out,3), intensity (max_out,), valid (max_out,)).
    When more than `max_out` voxels are occupied the output thins uniformly
    (every K-th voxel in cell-hash order is kept) instead of truncating a
    prefix — a prefix cut amputates a spatial half-space (measured: scan kept
    x>8.9 while the map kept x<12.6 — zero overlap).
    """
    n = xyz.shape[0]
    dtype = xyz.dtype
    coords = _cell_coords(xyz, voxel_size)
    coords = jnp.where(valid[:, None], coords, _SENTINEL)  # invalid sort last
    # Single-pass sort by the linear cell hash; segment boundaries use the
    # exact coords, so a rare hash collision at worst splits one voxel's run
    # into two (a few duplicate output points), never merges distinct voxels.
    # Payload-sort (see sort_with_payload): no argsort+take row gathers.
    keys = jnp.where(valid, _hash_coords(coords), _SENTINEL)
    _, cx_s, cy_s, cz_s, x_s, y_s, z_s, int_s, vi_s = sort_with_payload(
        keys, coords[:, 0], coords[:, 1], coords[:, 2],
        xyz[:, 0], xyz[:, 1], xyz[:, 2], intensity,
        valid.astype(jnp.int32),
    )
    valid_s = vi_s > 0
    coords_s = jnp.stack([cx_s, cy_s, cz_s], axis=1)

    first = jnp.concatenate(
        [
            jnp.ones((1,), bool),
            jnp.any(coords_s[1:] != coords_s[:-1], axis=-1),
        ]
    )
    seg_id = jnp.cumsum(first) - 1  # 0-based segment index, ascending
    seg_id = jnp.where(valid_s, seg_id, max_out)  # invalid -> overflow bucket

    # Capacity overflow: thin voxels UNIFORMLY (1-in-K/max_out stride over
    # the hash-sorted cell list) instead of keeping the first max_out. The
    # linear cell hash is a (wrapping) linear functional of the coords, so
    # "first max_out in hash order" amputates a spatially coherent
    # half-space — measured on the 60-frame varied drive: the scan's ground
    # features kept x>8.9 while the accumulated submap kept x<12.6, their
    # overlap collapsed to a 4 m sliver, and the f12 solve lost every
    # family at once. Strided thinning keeps full spatial coverage at
    # reduced density (graceful, like the reference's unbounded
    # unordered_map grid which never drops at all, PointCloud2.cpp:358-403).
    n_cells = jnp.sum(first & valid_s)  # dynamic; shapes stay static
    ratio = max_out / jnp.maximum(n_cells, 1).astype(xyz.dtype)
    row = jnp.floor(seg_id.astype(xyz.dtype) * ratio).astype(jnp.int32)
    prev_row = jnp.floor((seg_id - 1).astype(xyz.dtype) * ratio).astype(jnp.int32)
    kept = (seg_id == 0) | (row > prev_row)
    seg_id = jnp.where(
        n_cells > max_out,
        jnp.where(valid_s & kept, jnp.minimum(row, max_out - 1), max_out),
        seg_id,
    )

    # Run reduction WITHOUT a scatter (an N-row scatter-add costs ~1 ms at
    # 131k rows — r5 HLO profile): per-voxel sums come from an inclusive
    # cumsum over the sorted stream, differenced at run boundaries. f32
    # cumsums at this length lose ~eps*|total|*log(n) absolute — meters at
    # map scale — so the summed quantities are CELL-ANCHORED integer
    # fixed point: delta = p - cell_origin in [0, cell) quantized so the
    # worst-case int32 cumsum cannot overflow (exact arithmetic; residual
    # <= 1/(2*QD) ~ 6e-5 m, far below sensor noise).
    include = valid_s & (seg_id < max_out)
    # power-of-two quanta, as fine as the no-overflow bound allows:
    # worst case |sum| <= n * cell * qd < 2^30 (2x int32 headroom)
    qd = float(
        1 << max(0, min(22, int(np.log2((1 << 30) / (n * max(voxel_size, 1e-9))))))
    )
    # intensity bound is data-dependent (reflectance in [0,1] vs ring ids up
    # to 63): pick the quantum from the actual max so precision adapts
    imax = jnp.maximum(jnp.max(jnp.where(valid_s, jnp.abs(int_s), 0.0)), 1e-6)
    qi = jnp.exp2(
        jnp.clip(jnp.floor(jnp.log2((1 << 30) / (n * imax))), 0.0, 22.0)
    ).astype(dtype)
    inc = include.astype(jnp.int32)
    dxq = jnp.round((x_s - cx_s.astype(dtype) * voxel_size) * qd).astype(jnp.int32) * inc
    dyq = jnp.round((y_s - cy_s.astype(dtype) * voxel_size) * qd).astype(jnp.int32) * inc
    dzq = jnp.round((z_s - cz_s.astype(dtype) * voxel_size) * qd).astype(jnp.int32) * inc
    inq = jnp.round(int_s * qi).astype(jnp.int32) * inc
    lanes = jnp.stack([dxq, dyq, dzq, inq, inc], axis=1)  # (N,5) int32
    csum = jnp.cumsum(lanes, axis=0)  # exact int32, overflow-proof by qd/qi

    # positions + cell coords of each included run's FIRST element, compacted
    # to output order by a second payload sort (seg_id is ascending over
    # runs, so sorted order == output slot order)
    big = jnp.asarray(_SENTINEL, jnp.int32)
    start_key = jnp.where(first & include, seg_id, big)
    pos = jnp.arange(n, dtype=jnp.int32)
    sk, sp, scx, scy, scz = sort_with_payload(start_key, pos, cx_s, cy_s, cz_s)

    def takepad(a, fill):  # static slice/pad to max_out (n may be < max_out)
        if a.shape[0] >= max_out:
            return a[:max_out]
        return jnp.pad(a, (0, max_out - a.shape[0]), constant_values=fill)

    sk, sp = takepad(sk, _SENTINEL), takepad(sp, 0)
    scx, scy, scz = takepad(scx, 0), takepad(scy, 0), takepad(scz, 0)
    out_ok = sk < big
    starts = jnp.where(out_ok, sp, n)
    bpos = jnp.concatenate([starts, jnp.asarray([n], jnp.int32)])  # (max_out+1,)
    # exclusive cumsum at each boundary: rows between runs contribute zero
    excl = jnp.where(
        (bpos > 0)[:, None],
        jnp.take(csum, jnp.maximum(bpos - 1, 0), axis=0),
        0,
    )  # (max_out+1, 5) — a max_out-row gather, not an N-row one
    sums = (excl[1:] - excl[:-1]).astype(dtype)
    cnt = sums[:, 4]
    out_valid = out_ok & (cnt > 0)
    denom = jnp.maximum(cnt, 1.0)
    cell0 = jnp.stack([scx, scy, scz], axis=1).astype(dtype) * voxel_size
    out_xyz = cell0 + sums[:, :3] / (qd * denom[:, None])
    out_int = sums[:, 3] / (qi * denom)
    return (
        jnp.where(out_valid[:, None], out_xyz, 0.0),
        jnp.where(out_valid, out_int, 0.0),
        out_valid,
    )


def voxel_select_top(
    xyz: jax.Array,
    intensity: jax.Array,
    valid: jax.Array,
    score: jax.Array,
    voxel_size: float,
    max_out: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Keep the single highest-`score` ORIGINAL point of each occupied
    voxel (no averaging): spatial-coverage selection that preserves true
    surface samples. Sort by (cell hash, descending quantized score); each
    run's first element is its voxel's winner, compacted to `max_out` slots
    in hash order (uniform thinning on overflow, like voxel_downsample)."""
    n = xyz.shape[0]
    dtype = xyz.dtype
    coords = _cell_coords(xyz, voxel_size)
    coords = jnp.where(valid[:, None], coords, _SENTINEL)
    # 21 high bits of cell hash, 10 low bits of inverted score rank: one
    # int32 key sorts by (cell, score desc). Hash collisions at 21 bits are
    # common-ish (2M buckets) — boundaries below still use exact coords, so
    # a collision only risks picking per half-run (benign).
    h = _hash_coords(coords) & 0x7FFFFFFF
    smax = jnp.max(jnp.where(valid, score, -jnp.inf))
    smin = jnp.min(jnp.where(valid, score, jnp.inf))
    lo = jnp.where(jnp.isfinite(smin), smin, 0.0)
    width = jnp.maximum(jnp.where(jnp.isfinite(smax), smax, 1.0) - lo, 1e-12)
    sq = jnp.clip(((score - lo) / width * 1023.0).astype(jnp.int32), 0, 1023)
    key = jnp.where(valid, (h >> 10 << 10) | (1023 - sq), _SENTINEL)
    _, cx_s, cy_s, cz_s, x_s, y_s, z_s, int_s, vi_s = sort_with_payload(
        key, coords[:, 0], coords[:, 1], coords[:, 2],
        xyz[:, 0], xyz[:, 1], xyz[:, 2], intensity,
        valid.astype(jnp.int32),
    )
    valid_s = vi_s > 0
    first = jnp.concatenate(
        [
            jnp.ones((1,), bool),
            (cx_s[1:] != cx_s[:-1]) | (cy_s[1:] != cy_s[:-1])
            | (cz_s[1:] != cz_s[:-1]),
        ]
    )
    winner = first & valid_s
    seg = jnp.cumsum(winner.astype(jnp.int32)) - 1  # winner rank
    n_cells = jnp.sum(winner)
    ratio = max_out / jnp.maximum(n_cells, 1).astype(dtype)
    row = jnp.floor(seg.astype(dtype) * ratio).astype(jnp.int32)
    prev_row = jnp.floor((seg - 1).astype(dtype) * ratio).astype(jnp.int32)
    kept = (seg == 0) | (row > prev_row)
    slot = jnp.where(
        n_cells > max_out,
        jnp.where(winner & kept, jnp.minimum(row, max_out - 1), _SENTINEL),
        jnp.where(winner, seg, _SENTINEL),
    )
    sk, ox, oy, oz, oi = sort_with_payload(slot, x_s, y_s, z_s, int_s)

    def takepad(a, fill=0.0):
        if a.shape[0] >= max_out:
            return a[:max_out]
        return jnp.pad(a, (0, max_out - a.shape[0]), constant_values=fill)

    out_ok = takepad(sk, _SENTINEL) < _SENTINEL
    m = out_ok.astype(dtype)
    out_xyz = jnp.stack(
        [takepad(ox) * m, takepad(oy) * m, takepad(oz) * m], axis=1
    )
    return out_xyz, takepad(oi) * m, out_ok


# ---------------------------------------------------------------------------
# Direct-addressed (bucketized) hash table
# ---------------------------------------------------------------------------
#
# jnp.searchsorted lowers to a ~log2(M)-step binary search, each step a
# dependent gather — 16 serial gather rounds for a 65k table. This table
# answers the same lookup with ONE row gather: entries live in 8-slot
# BUCKETS of interleaved (check, payload) int32 pairs, 8 buckets per
# 128-lane physical row. The lookup is a full-row `take` along axis 0 (the
# embedding-lookup pattern — the one gather shape the TPU DMA engine is
# actually fast at; jax.lax.gather with small slice_sizes lowers to a
# catastrophic serial path, measured 50x slower in-program) followed by an
# in-register masked select of the bucket's 16-lane group.


_BUCKET = 8  # slots per bucket (load factor 0.125 at B = next_pow2(V))
_CHECK_MIX = np.int32(np.uint32(2654435761) & 0x7FFFFFFF)


def _check_code(h1: jax.Array, h2: jax.Array) -> jax.Array:
    """64-bit-strength verification in one int32: mixes BOTH hashes (the
    bucket index pins h1's low bits; this pins the rest). SENTINEL is
    reserved for empty slots."""
    c = h2 + h1 * _CHECK_MIX
    return jnp.where(c == _SENTINEL, _SENTINEL - 1, c)


class DirectTable(NamedTuple):
    """slots: (B/8, 128) int32 — B buckets of 8 (check, payload) slot pairs;
    bucket b spans lanes [16*(b%8), 16*(b%8)+16) of row b//8. Empty slots
    hold SENTINEL in the check lane. B = next_pow2(max(V, 64)): 8 slots per
    bucket at expected load 1 entry/bucket makes overflow drops ~1e-6."""

    slots: jax.Array


def build_direct_table(
    keys: jax.Array,
    keys2: jax.Array,
    valid: jax.Array,
    payload: jax.Array,
) -> DirectTable:
    """Insert V entries: ONE sort by bucket id gives each entry its in-bucket
    rank (sorted same-bucket entries are adjacent); rank >= 8 overflows are
    dropped (probability ~1e-6 at load 1 entry/bucket; callers tolerate a
    missed neighbor). One sort + two scatters — 6x cheaper than the previous
    8 rounds of slot races (each a gather + a segment-min over 8V slots)."""
    V = keys.shape[0]
    B = 1 << int(np.ceil(np.log2(max(V, 64))))
    mask = B - 1
    H = B * _BUCKET
    check = _check_code(keys, keys2)
    bucket = jnp.where(valid, keys & mask, B)  # invalid sorts last

    order = jnp.argsort(bucket)
    # ONE packed (V,4) row-take + ONE (V,2) row-scatter (TPU gathers and
    # scatters pay per row; empty payload lanes read SENTINEL, never hit)
    packed_in = jnp.stack(
        [bucket, check, payload, valid.astype(jnp.int32)], axis=1
    )
    ps = jnp.take(packed_in, order, axis=0)
    b_s, check_s, pay_s = ps[:, 0], ps[:, 1], ps[:, 2]
    valid_s = ps[:, 3] > 0
    idx = jnp.arange(V, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones((1,), bool), b_s[1:] != b_s[:-1]])
    start = jax.lax.cummax(jnp.where(first, idx, 0))
    rank = idx - start
    tgt = jnp.where(valid_s & (rank < _BUCKET), b_s * _BUCKET + rank, H)
    rec = jnp.stack([check_s, pay_s], axis=1)  # (V,2) (check, payload) pairs
    slots = jnp.full((H + 1, 2), _SENTINEL, jnp.int32).at[tgt].set(
        rec, mode="drop"
    )[:H]
    # (H,2) row-major == interleaved (check, payload): 8 buckets per 128-lane row
    return DirectTable(slots=slots.reshape(B // 8, 128))


def direct_lookup(
    table: DirectTable, h1: jax.Array, h2: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Vectorized lookup. h1/h2 any shape. Returns (found (bool), payload) —
    payload 0 where not found. ONE 16-lane gather per query.

    The match is evaluated LANE-WISE on the raw (n, 128) rows: a hit is a
    check-lane (even lane offset) whose value equals the query's check code
    within the query's 16-lane bucket group; the payload sits one lane to the
    right, aligned by a single lane roll. Reshaping to (n, 8, 16) instead
    would give the tensor a 16-wide minor dim that TPU tiling pads to 128
    lanes — an 8x memory blowup on the hot (V*8)-query probe path."""
    B = table.slots.shape[0] * 8
    mask = B - 1
    shape = h1.shape
    h1f = h1.reshape(-1)
    check = _check_code(h1f, h2.reshape(-1))
    bucket = h1f & mask
    rows = jnp.take(table.slots, bucket >> 3, axis=0)  # (n, 128) row gather
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    is_check_lane = (lane & 1) == 0
    in_group = (lane >> 4) == (bucket & 7)[:, None]
    # duplicate keys are never inserted, so at most one lane hits
    hit = (rows == check[:, None]) & is_check_lane & in_group
    found = jnp.any(hit, axis=-1)
    pay_aligned = jnp.roll(rows, shift=-1, axis=-1)  # payload onto its check lane
    payv = jnp.sum(jnp.where(hit, pay_aligned, 0), axis=-1)
    return found.reshape(shape), payv.reshape(shape)


# ---------------------------------------------------------------------------
# Hash-grid kNN
# ---------------------------------------------------------------------------


class HashGrid(NamedTuple):
    """Cell-run spatial index over a fixed-capacity point buffer.

    pts3     : (3, M) point coordinates in hash-sorted order, packed so ONE
               gather serves x, y and z (see module docstring on TPU tiling)
    src_idx  : (M,)  original buffer index of each sorted slot
    dt       : DirectTable mapping (h1,h2) of a cell -> (run start, count)
               in the sorted order; replaces binary search entirely
    cell_size: ()    float — the grid pitch (= default query radius)
    """

    pts3: jax.Array
    src_idx: jax.Array
    dt: "DirectTable"
    cell_size: jax.Array


def build_hash_grid(points: jax.Array, valid: jax.Array, cell_size) -> HashGrid:
    M = points.shape[0]
    coords = _cell_coords(points, cell_size)
    keys = jnp.where(valid, _hash_coords(coords), _SENTINEL)
    keys2 = jnp.where(valid, _hash2_coords(coords), 0)
    # Single-key sort: same-cell points share a key so they stay contiguous;
    # with the linear hash, distinct nearby cells essentially never collide,
    # so no secondary ordering is needed (TPU sorts are expensive — one pass,
    # not a 4-pass lexsort).
    order = jnp.argsort(keys)
    # ONE packed (M,2) row-take for both sorted keys (per-row gather costs)
    ks = jnp.take(jnp.stack([keys, keys2], axis=1), order, axis=0)
    keys_s, keys2_s = ks[:, 0], ks[:, 1]

    # cell runs: start positions + counts, addressed by the direct table
    run_first = jnp.concatenate(
        [jnp.ones((1,), bool), keys_s[1:] != keys_s[:-1]]
    ) & (keys_s != _SENTINEL)
    cell_id = jnp.cumsum(run_first) - 1  # (M,) id of each slot's cell
    cell_id_c = jnp.where(keys_s != _SENTINEL, cell_id, M)
    pos = jnp.arange(M, dtype=jnp.int32)
    tgt = jnp.where(run_first, cell_id, M)
    # ONE packed (M,3) row-scatter for (start, key, key2)
    crec = jnp.full((M + 1, 3), _SENTINEL, jnp.int32).at[tgt].set(
        jnp.stack([pos, keys_s, keys2_s], axis=1), mode="drop"
    )[:M]
    # unused rows are exactly those with a SENTINEL key lane (run_first
    # implies keys_s != SENTINEL, and pos/keys2 lanes must not be gated on
    # their own values — keys2 may legitimately equal any int32)
    unused = crec[:, 1] == _SENTINEL
    starts = jnp.where(unused, 0, crec[:, 0])
    cell_key = crec[:, 1]
    cell_key2 = jnp.where(unused, 0, crec[:, 2])
    counts = jax.ops.segment_sum(
        jnp.ones((M,), jnp.int32), cell_id_c, num_segments=M + 1
    )[:M]
    # pack (start, count) into one int32 payload: start << 8 | min(count,
    # 255); start < 2^23 for any realistic buffer, count is clamped to
    # max_per_cell (<=255) by every consumer anyway
    dt = build_direct_table(
        cell_key,
        cell_key2,
        cell_key != _SENTINEL,
        starts * 256 + jnp.minimum(counts, 255),
    )
    return HashGrid(
        pts3=points[order].T,
        src_idx=order.astype(jnp.int32),
        dt=dt,
        cell_size=jnp.asarray(cell_size, points.dtype),
    )


_OFF1 = jnp.asarray([i for i in (-1, 0, 1) for _ in range(9)], jnp.int32)
_OFF2 = jnp.asarray([j for _ in range(3) for j in (-1, 0, 1) for _ in range(3)], jnp.int32)
_OFF3 = jnp.asarray([k for _ in range(9) for k in (-1, 0, 1)], jnp.int32)


def _query_block(
    grid: HashGrid,
    queries: jax.Array,
    query_valid: jax.Array,
    k: int,
    r,
    C: int,
):
    M = grid.src_idx.shape[0]
    q = queries.shape[0]

    qc = _cell_coords(queries, grid.cell_size)  # (q,3)
    # neighbor cell coords as scalar planes (q,27)
    nx = qc[:, 0:1] + _OFF1[None, :]
    ny = qc[:, 1:2] + _OFF2[None, :]
    nz = qc[:, 2:3] + _OFF3[None, :]
    nbr_hash = nx * _P1 + ny * _P2 + nz * _P3  # (q,27)
    nbr_hash2 = _hash2_parts(nx, ny, nz)

    found, pay = direct_lookup(grid.dt, nbr_hash, nbr_hash2)  # (q,27)
    start = pay >> 8
    count = pay & 255

    # candidate slots in (q, 27*C) planes — large axis minor (TPU tiling)
    slots = (
        start[:, :, None] + jnp.arange(C, dtype=start.dtype)[None, None, :]
    ).reshape(q, 27 * C)
    slots_c = jnp.minimum(slots, M - 1)
    within = (
        jnp.arange(C, dtype=jnp.int32)[None, None, :]
        < jnp.minimum(count, C)[:, :, None]
    ).reshape(q, 27 * C)
    match = within & jnp.repeat(found, C, axis=1)

    cand = jnp.take(grid.pts3, slots_c.reshape(-1), axis=1).reshape(3, q, 27 * C)
    dx = cand[0] - queries[:, 0:1]
    dy = cand[1] - queries[:, 1:2]
    dz = cand[2] - queries[:, 2:3]
    dist_sq = dx * dx + dy * dy + dz * dz
    ok = match & (dist_sq <= r * r) & query_valid[:, None]

    BIG = jnp.asarray(jnp.finfo(queries.dtype).max, queries.dtype)
    masked = jnp.where(ok, dist_sq, BIG)

    neg_top, arg_top = jax.lax.top_k(-masked, k)  # (q,k)
    take = lambda a: jnp.take_along_axis(a, arg_top, axis=-1)
    nn_slot = take(slots_c)
    nn_ok = take(ok)
    nn_dist = -neg_top
    nn_idx = grid.src_idx[nn_slot]
    return nn_idx, jnp.where(nn_ok, nn_dist, BIG), nn_ok


def query_knn(
    grid: HashGrid,
    queries: jax.Array,
    query_valid: jax.Array,
    k: int,
    radius: float | None = None,
    max_per_cell: int = 8,
    chunk_size: int | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Batched k-nearest-neighbors within `radius` (defaults to cell_size).

    queries: (Q,3). Returns (idx (Q,k) into the ORIGINAL buffer,
    dist_sq (Q,k), neighbor_valid (Q,k)). Replaces KDTreeFlann::SearchHybrid.
    Set `chunk_size` to process queries in lax.map chunks (bounds peak
    memory to O(chunk_size * 27 * max_per_cell)).
    """
    r = grid.cell_size if radius is None else jnp.asarray(radius, queries.dtype)
    Q = queries.shape[0]
    C = max_per_cell
    if chunk_size is None or chunk_size >= Q:
        return _query_block(grid, queries, query_valid, k, r, C)

    pad = (-Q) % chunk_size
    qs = jnp.pad(queries, ((0, pad), (0, 0)))
    qv = jnp.pad(query_valid, (0, pad))
    n_chunks = (Q + pad) // chunk_size
    qs = qs.reshape(n_chunks, chunk_size, 3)
    qv = qv.reshape(n_chunks, chunk_size)

    idx, dist, ok = jax.lax.map(
        lambda args: _query_block(grid, args[0], args[1], k, r, C), (qs, qv)
    )
    unpack = lambda a: a.reshape(n_chunks * chunk_size, k)[:Q]
    return unpack(idx), unpack(dist), unpack(ok)


def gather_planes(points: jax.Array, idx: jax.Array):
    """Gather neighbor coordinates as three (Q,k) scalar planes (SoA) —
    avoids materializing a (Q,k,3) tensor (see module docstring)."""
    return points[:, 0][idx], points[:, 1][idx], points[:, 2][idx]


# ---------------------------------------------------------------------------
# Packed record gathers
# ---------------------------------------------------------------------------
#
# TPU gather cost scales with the number of gather ROWS, not elements —
# contiguous lanes are nearly free while a K-column strided gather from a
# (K, V) SoA block costs K rows per index. Packing each record's K values
# into W contiguous lanes (128/W records per physical row) turns the fetch
# into ONE (1, W)-slice gather per index.


def pack_records(cols: jax.Array, width: int) -> jax.Array:
    """Pack a (K <= width, V) SoA block into (ceil(V/(128/width)), 128) rows
    of `width`-lane records. `width` must divide 128."""
    K, V = cols.shape
    per = 128 // width
    Vp = -(-V // per) * per
    a = jnp.pad(cols, ((0, width - K), (0, Vp - V)))
    return a.T.reshape(Vp // per, 128)


def unpack_records(packed: jax.Array, k: int, width: int) -> jax.Array:
    """Inverse of pack_records: (rows, 128) -> (k, rows*128/width) SoA block
    (first k lanes of each record; trailing pad records included)."""
    per = 128 // width
    rows = packed.shape[0]
    return packed.reshape(rows * per, width).T[:k]


def gather_records(packed: jax.Array, idx: jax.Array, width: int, k: int):
    """Fetch records packed by `pack_records`: idx (n,) -> (n, k) (the first
    k lanes of each record). Full-row `take` + in-register masked group
    select — jax.lax.gather with small slice_sizes lowers to a serial path
    on TPU (measured 50x slower); the row take is the fast DMA pattern.
    Out-of-range idx must be clamped by the caller."""
    per = 128 // width
    rows = jnp.take(packed, idx // per, axis=0)  # (n, 128)
    grp = rows.reshape(-1, per, width)
    sel = (idx % per)[:, None, None] == jnp.arange(per)[None, :, None]
    rec = jnp.sum(jnp.where(sel, grp, 0), axis=1)  # (n, width)
    return rec[:, :k]


# ---------------------------------------------------------------------------
# Morton-block record store (2x2x2 cell blocks, one 128-lane row per block)
# ---------------------------------------------------------------------------
#
# TPU gathers pay per ROW. A 27-cell (3x3x3) window fetched cell-by-cell
# costs 27 hash probes + 27 record rows per query. Grouping cells into
# 2x2x2 BLOCKS (block = cell >> 1) and storing each block's 8 cell records
# in ONE 128-lane row (8 slots x 16 lanes) covers any 3x3x3 cell window
# with exactly 8 block rows: per axis the window spans blocks
# {b + p - 1, b + p} where p = cell & 1 is the query cell's parity. The
# fetch is 8 probes + 8 row takes = 16 rows/query instead of 54 — and every
# candidate record is already in registers (no second "winner" gather).
#
# Candidate geometry is parity-arithmetic, independent of the query coords:
# for block choice e in {0,1}^3 and slot s with local bits l in {0,1}^3, the
# candidate cell offset from the query cell is, per axis,
#     d = l + p + 2e - 2   in [-2, 2],
# and the 27-window mask is |d| <= 1 (each in-window cell appears exactly
# once among the 64 candidates).

# e bits (8,) and slot-local bits (8,) for candidate offset arithmetic
_EB = tuple(
    jnp.asarray([(i >> k) & 1 for i in range(8)], jnp.int32) for k in range(3)
)


class BlockTable(NamedTuple):
    """Cell index + Morton-block addressing over a fixed point buffer.

    cx/cy/cz   : (V,) int32 cell coords (sentinel where unused)
    cell_valid : (V,)
    point_cell : (N,) int32 cell row per point (-1 invalid)
    cell_store : (V,) int32 = block_row * 8 + slot; slot = Morton parity
                 (cx&1) + 2(cy&1) + 4(cz&1). Store position of each cell.
    dt         : DirectTable mapping block hash -> block row

    The block capacity B equals max_cells (= cx.shape[0]): every block holds
    at least one cell, so blocks never outnumber cells.
    """

    cx: jax.Array
    cy: jax.Array
    cz: jax.Array
    cell_valid: jax.Array
    point_cell: jax.Array
    cell_store: jax.Array
    dt: "DirectTable"


def _block_hashes(bx: jax.Array, by: jax.Array, bz: jax.Array):
    # distinct constants from the cell hashes: a block never aliases a cell
    h1 = bx * jnp.int32(2654435761 & 0x7FFFFFFF) + by * _P2 + bz * _P3
    h2 = _hash2_parts(bz, bx, by)
    return h1, h2


def build_block_table(
    points: jax.Array, valid: jax.Array, cell_size, max_cells: int
) -> BlockTable:
    """Cell dedup (as build_cell_table) + block dedup + block-hash table.
    Block capacity B = max_cells (every block holds >= 1 cell)."""
    n = points.shape[0]
    coords = _cell_coords(points, cell_size)
    coords = jnp.where(valid[:, None], coords, _SENTINEL)
    pkeys = jnp.where(valid, _hash_coords(coords), _SENTINEL)
    order_p = jnp.argsort(pkeys)
    # packed (N,4) take + (N,4) cell-row scatter (per-row costs — see
    # build_direct_table); all same-cell writers carry identical rows, so
    # scatter-set write races are benign
    ps = jnp.take(
        jnp.concatenate([coords, valid[:, None].astype(jnp.int32)], axis=1),
        order_p,
        axis=0,
    )
    cs_ = ps[:, :3]
    ok_s = ps[:, 3] > 0
    first = jnp.concatenate(
        [jnp.ones((1,), bool), jnp.any(cs_[1:] != cs_[:-1], axis=-1)]
    )
    seg = jnp.cumsum(first) - 1
    seg_c = jnp.where(ok_s & (seg < max_cells), seg, max_cells)

    cell_rows = jnp.full((max_cells + 1, 4), _SENTINEL, jnp.int32).at[seg_c].set(
        jnp.where(ok_s[:, None], ps, _SENTINEL)
    )[:max_cells]
    cx, cy, cz = cell_rows[:, 0], cell_rows[:, 1], cell_rows[:, 2]
    cell_valid = cell_rows[:, 3] == 1
    point_cell = jnp.full((n,), -1, jnp.int32)
    point_cell = point_cell.at[order_p].set(
        jnp.where(seg_c < max_cells, seg_c, -1).astype(jnp.int32)
    )

    # --- block dedup over the (small) cell list ---
    B = max_cells
    bx, by, bz = cx >> 1, cy >> 1, cz >> 1
    bh1, bh2 = _block_hashes(bx, by, bz)
    bkey = jnp.where(cell_valid, bh1, _SENTINEL)
    order_c = jnp.argsort(bkey)
    bs = jnp.take(
        jnp.stack(
            [
                jnp.where(cell_valid, bx, _SENTINEL),
                jnp.where(cell_valid, by, _SENTINEL),
                jnp.where(cell_valid, bz, _SENTINEL),
                cell_valid.astype(jnp.int32),
            ],
            axis=1,
        ),
        order_c,
        axis=0,
    )
    bxs, bys, bzs = bs[:, 0], bs[:, 1], bs[:, 2]
    okc = bs[:, 3] > 0
    bfirst = jnp.concatenate(
        [
            jnp.ones((1,), bool),
            (bxs[1:] != bxs[:-1]) | (bys[1:] != bys[:-1]) | (bzs[1:] != bzs[:-1]),
        ]
    )
    bseg = jnp.cumsum(bfirst) - 1  # block row per sorted cell
    bseg_c = jnp.where(okc, bseg, B)
    cell_block = jnp.full((max_cells,), 0, jnp.int32)
    cell_block = cell_block.at[order_c].set(
        jnp.minimum(bseg_c, B - 1).astype(jnp.int32)
    )

    block_rows = jnp.full((B + 1, 4), _SENTINEL, jnp.int32).at[bseg_c].set(
        jnp.where(okc[:, None], bs, _SENTINEL)
    )[:B]
    ubx, uby, ubz = block_rows[:, 0], block_rows[:, 1], block_rows[:, 2]
    block_valid = block_rows[:, 3] == 1
    uh1, uh2 = _block_hashes(ubx, uby, ubz)
    dt = build_direct_table(
        jnp.where(block_valid, uh1, _SENTINEL), uh2, block_valid,
        jnp.arange(B, dtype=jnp.int32),
    )
    slot = (cx & 1) + 2 * (cy & 1) + 4 * (cz & 1)
    cell_store = cell_block * 8 + jnp.where(cell_valid, slot, 0)
    return BlockTable(cx, cy, cz, cell_valid, point_cell, cell_store, dt)


def block_window_probe_rows(
    bt: BlockTable, qcx: jax.Array, qcy: jax.Array, qcz: jax.Array
):
    """Probe-only variant of block_window_probe: (rows (Q,8), found (Q,8)).
    The per-candidate offset/window tensors are skipped — callers that fold
    the window geometry into constant coefficient tables (the matmul window
    aggregation below) never need them materialized."""
    px, py, pz = qcx & 1, qcy & 1, qcz & 1
    bx, by, bz = qcx >> 1, qcy >> 1, qcz >> 1
    ex, ey, ez = _EB
    nbx = bx[:, None] + ex[None, :] + px[:, None] - 1  # (Q,8)
    nby = by[:, None] + ey[None, :] + py[:, None] - 1
    nbz = bz[:, None] + ez[None, :] + pz[:, None] - 1
    h1, h2 = _block_hashes(nbx, nby, nbz)
    found, rows = direct_lookup(bt.dt, h1, h2)  # (Q,8)
    return rows, found


def block_window_probe(
    bt: BlockTable, qcx: jax.Array, qcy: jax.Array, qcz: jax.Array
):
    """Probe the 8 blocks covering the 3x3x3 cell window of each query cell.

    Returns (rows (Q,8) block row ids, found (Q,8), (dx,dy,dz) (Q,64) int32
    candidate cell offsets, window (Q,64) bool |d|<=1 mask). Candidate
    (e, s) lives at flat index e*8 + s."""
    px, py, pz = qcx & 1, qcy & 1, qcz & 1
    rows, found = block_window_probe_rows(bt, qcx, qcy, qcz)
    ex, ey, ez = _EB

    lx, ly, lz = _EB  # slot-local bits share the e-bit table
    # d[q, e, s] = l[s] + p[q] + 2 e[e] - 2, flattened (Q, 64)
    def dax(l, p, e):
        return (
            l[None, None, :] + p[:, None, None] + 2 * e[None, :, None] - 2
        ).reshape(-1, 64)

    dx = dax(lx, px, ex)
    dy = dax(ly, py, ey)
    dz = dax(lz, pz, ez)
    window = (
        (jnp.abs(dx) <= 1) & (jnp.abs(dy) <= 1) & (jnp.abs(dz) <= 1)
        & jnp.repeat(found, 8, axis=1)
    )
    return rows, found, (dx, dy, dz), window


def block_window_records(
    store: jax.Array, rows: jax.Array, found: jax.Array
) -> jax.Array:
    """Fetch the 8 block rows per query: (Q,8) -> (Q, 64, 16) candidate
    records (slot-major within block; zeros where the block is absent)."""
    q = rows.shape[0]
    r = jnp.take(store, jnp.where(found, rows, 0).reshape(-1), axis=0)
    r = r.reshape(q, 8, 8, 16) * found[:, :, None, None].astype(store.dtype)
    return r.reshape(q, 64, 16)


def scatter_cell_records(
    bt: BlockTable, values: jax.Array, width: int = 16
) -> jax.Array:
    """Scatter per-cell records (V, k<=width) into the (B, 128) block store
    (8 slots x width lanes per row)."""
    V, k = values.shape
    B = bt.cx.shape[0]
    vals = jnp.pad(values, ((0, 0), (0, width - k)))
    tgt = jnp.where(bt.cell_valid, bt.cell_store, B * 8)
    out = jnp.zeros((B * 8 + 1, width), values.dtype).at[tgt].set(vals)
    return out[: B * 8].reshape(B, 8 * width)


def _window_coeff_tables():
    """Constant integer tables for the matmul window aggregation.

    The 27-cell window moments of query cell i are LINEAR in the fetched
    block records: out[i, stat] = sum_L rec_flat[i, L] * M[p(i)][L, stat]
    with lane L = e*128 + s*16 + f (block choice e, slot s, field f) and
    p(i) the query cell's 3-bit parity. The parallel-axis shift coefficients
    are polynomials in cell_size: M = W0 + cs*W1 + cs^2*W2 with integer
    W0/W1/W2 — built once here, so the whole 64-candidate aggregation is a
    single (V, 1024) @ (1024, 80) MXU matmul + an 8-way parity select,
    instead of materializing (V, 64, 16) record tensors whose 16-lane minor
    dim TPU tiling pads 8x.

    Also returns WMAX (8, 64) float window masks (candidate c = e*8 + s)
    for max-style window passes."""
    W0 = np.zeros((8, 8, 8, 16, 10), np.float64)  # [p, e, s, f, stat]
    W1 = np.zeros_like(W0)
    W2 = np.zeros_like(W0)
    WMAX = np.zeros((8, 8, 8), np.float64)  # [p, e, s]
    for p in range(8):
        px, py, pz = p & 1, (p >> 1) & 1, (p >> 2) & 1
        for e in range(8):
            exb, eyb, ezb = e & 1, (e >> 1) & 1, (e >> 2) & 1
            for s in range(8):
                lx, ly, lz = s & 1, (s >> 1) & 1, (s >> 2) & 1
                dx = lx + px + 2 * exb - 2
                dy = ly + py + 2 * eyb - 2
                dz = lz + pz + 2 * ezb - 2
                if abs(dx) > 1 or abs(dy) > 1 or abs(dz) > 1:
                    continue
                WMAX[p, e, s] = 1.0
                c = (p, e, s)
                W0[c][0, 0] = 1
                W0[c][1, 1] = 1; W1[c][0, 1] = dx
                W0[c][2, 2] = 1; W1[c][0, 2] = dy
                W0[c][3, 3] = 1; W1[c][0, 3] = dz
                W0[c][4, 4] = 1; W1[c][1, 4] = 2 * dx; W2[c][0, 4] = dx * dx
                W0[c][5, 5] = 1; W1[c][2, 5] = dx; W1[c][1, 5] = dy; W2[c][0, 5] = dx * dy
                W0[c][6, 6] = 1; W1[c][3, 6] = dx; W1[c][1, 6] = dz; W2[c][0, 6] = dx * dz
                W0[c][7, 7] = 1; W1[c][2, 7] = 2 * dy; W2[c][0, 7] = dy * dy
                W0[c][8, 8] = 1; W1[c][3, 8] = dy; W1[c][2, 8] = dz; W2[c][0, 8] = dy * dz
                W0[c][9, 9] = 1; W1[c][3, 9] = 2 * dz; W2[c][0, 9] = dz * dz
    rs = lambda W: W.reshape(8, 1024, 10)
    return rs(W0), rs(W1), rs(W2), WMAX.reshape(8, 64)


_W0, _W1, _W2, _WMAX = _window_coeff_tables()


def block_window_moments(
    xyz: jax.Array,
    valid: jax.Array,
    bt: BlockTable,
    cell_size,
    return_cell: bool = False,
):
    """27-cell window moments about each cell's own anchor via the block
    store (same anchored parallel-axis math as anchored_window_moments —
    see there for the f32 rationale).

    The aggregation over the 64 window candidates is ONE MXU matmul against
    a constant parity-indexed coefficient matrix (see _window_coeff_tables):
    the fetched (V*8, 128) block rows are used in their natural layout, so
    nothing with a sub-128 minor dim is ever materialized.

    Returns (anchors (3,V), moments (cnt, sx..szz) each (V,), probe cache
    (rows, found, parity) for reuse by same-window passes). With
    `return_cell`, additionally returns the PER-CELL moments (V, 10) about
    the same anchors (no window aggregation) — the locality the reference's
    per-query 5-NN fits have, needed for line fits where a 3-cell window
    smears distinct structures together."""
    dtype = xyz.dtype
    V = bt.cx.shape[0]
    cs = jnp.asarray(cell_size, dtype)

    # per-point anchored moments, accumulated straight into store layout
    coords = _cell_coords(xyz, cell_size)
    qx = xyz[:, 0] - coords[:, 0].astype(dtype) * cs
    qy = xyz[:, 1] - coords[:, 1].astype(dtype) * cs
    qz = xyz[:, 2] - coords[:, 2].astype(dtype) * cs
    pc = bt.point_cell
    in_cell = valid & (pc >= 0)
    m = in_cell.astype(dtype)
    B = bt.cx.shape[0]
    seg = jnp.where(in_cell, bt.cell_store[jnp.maximum(pc, 0)], B * 8)

    vals = jnp.stack(
        [
            m,
            qx * m, qy * m, qz * m,
            qx * qx * m, qx * qy * m, qx * qz * m,
            qy * qy * m, qy * qz * m, qz * qz * m,
            jnp.zeros_like(m), jnp.zeros_like(m), jnp.zeros_like(m),
            jnp.zeros_like(m), jnp.zeros_like(m), jnp.zeros_like(m),
        ],
        axis=1,
    )  # (N, 16)
    store = jax.ops.segment_sum(vals, seg, num_segments=B * 8 + 1)[: B * 8]
    store = store.reshape(B, 128)

    rows, found = block_window_probe_rows(bt, bt.cx, bt.cy, bt.cz)
    r = jnp.take(store, jnp.where(found, rows, 0).reshape(-1), axis=0)
    r = r * found.reshape(-1, 1).astype(dtype)  # zero absent blocks
    rec_flat = r.reshape(V, 1024)  # lane L = e*128 + s*16 + f

    M = (
        jnp.asarray(_W0, dtype)
        + cs * jnp.asarray(_W1, dtype)
        + (cs * cs) * jnp.asarray(_W2, dtype)
    )  # (8, 1024, 10)
    Mflat = jnp.transpose(M, (1, 0, 2)).reshape(1024, 80)
    big = rec_flat @ Mflat  # (V, 80) — the whole window aggregation on MXU

    parity = (bt.cx & 1) + 2 * (bt.cy & 1) + 4 * (bt.cz & 1)  # (V,)
    out = jnp.zeros((V, 10), dtype)
    for p in range(8):
        out = out + jnp.where(
            (parity == p)[:, None], big[:, p * 10 : (p + 1) * 10], 0.0
        )

    anchors = (
        bt.cx.astype(dtype) * cs,
        bt.cy.astype(dtype) * cs,
        bt.cz.astype(dtype) * cs,
    )
    cache = (rows, found, parity)
    moments = tuple(out[:, i] for i in range(10))
    if return_cell:
        cell_rec = jnp.take(
            store.reshape(B * 8, 16), jnp.minimum(bt.cell_store, B * 8 - 1),
            axis=0,
        )[:, :10]
        cell_rec = cell_rec * bt.cell_valid[:, None].astype(dtype)
        return anchors, moments, cache, cell_rec
    return anchors, moments, cache


def block_window_scalar_max(
    bt: BlockTable,
    cell_values: jax.Array,
    rows: jax.Array,
    found: jax.Array,
    parity: jax.Array,
) -> jax.Array:
    """Per-cell max of a scalar over its 27-cell window, reusing a
    block_window_moments probe cache. The per-slot values live at lanes
    [0, 8) of a (B, 128) block-row store; the fetched (V*8, 128) rows are
    sliced to (V, 64) candidates and reduced under the constant parity
    window masks — no sub-128-minor-dim tensor is materialized at fetch."""
    B = bt.cx.shape[0]
    dtype = cell_values.dtype
    NEG = jnp.asarray(jnp.finfo(dtype).min, dtype)
    # value of cell (block b, slot s) at flat lane b*128 + s
    flat_tgt = jnp.where(
        bt.cell_valid,
        (bt.cell_store >> 3) * 128 + (bt.cell_store & 7),
        B * 128,
    )
    store = jnp.full((B * 128 + 1,), NEG, dtype).at[flat_tgt].set(
        jnp.where(bt.cell_valid, cell_values, NEG), mode="drop"
    )[: B * 128].reshape(B, 128)
    V = rows.shape[0]
    r = jnp.take(store, jnp.where(found, rows, 0).reshape(-1), axis=0)
    r = jnp.where(found.reshape(-1, 1), r[:, :8], NEG).reshape(V, 64)
    best = jnp.full((V,), NEG, dtype)
    for p in range(8):
        mask = jnp.asarray(_WMAX[p] > 0.5)
        m_p = jnp.max(jnp.where(mask[None, :], r, NEG), axis=-1)
        best = jnp.where(parity == p, m_p, best)
    return best


# ---------------------------------------------------------------------------
# Cell tables (unique-voxel indexing for cell-aggregation algorithms)
# ---------------------------------------------------------------------------


class CellTable(NamedTuple):
    """Unique-cell index over a point buffer.

    cx/cy/cz   : (V,) int32 cell coords of each unique cell (sentinel if unused)
    cell_valid : (V,)
    point_cell : (N,) int32 index into the cell table per point (-1 invalid)
    dt         : DirectTable mapping (h1,h2) -> table row
    """

    cx: jax.Array
    cy: jax.Array
    cz: jax.Array
    cell_valid: jax.Array
    point_cell: jax.Array
    dt: "DirectTable"


def build_cell_table(
    points: jax.Array, valid: jax.Array, cell_size, max_cells: int
) -> CellTable:
    """Deduplicate occupied cells (lexicographic) + hash lookup structure."""
    n = points.shape[0]
    coords = _cell_coords(points, cell_size)
    coords = jnp.where(valid[:, None], coords, _SENTINEL)
    pkeys = jnp.where(valid, _hash_coords(coords), _SENTINEL)
    order_p = jnp.argsort(pkeys)  # single-pass (see voxel_downsample note)
    cs = coords[order_p]
    ok_s = valid[order_p]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), jnp.any(cs[1:] != cs[:-1], axis=-1)]
    )
    seg = jnp.cumsum(first) - 1
    seg_c = jnp.where(ok_s & (seg < max_cells), seg, max_cells)

    def col(i):
        out = jnp.full((max_cells + 1,), _SENTINEL, jnp.int32)
        return out.at[seg_c].set(jnp.where(ok_s, cs[:, i], _SENTINEL))[:max_cells]

    cx, cy, cz = col(0), col(1), col(2)
    cell_valid = (
        jax.ops.segment_sum(
            ok_s.astype(jnp.int32), seg_c, num_segments=max_cells + 1
        )[:max_cells]
        > 0
    )
    point_cell = jnp.full((n,), -1, jnp.int32)
    point_cell = point_cell.at[order_p].set(
        jnp.where(seg_c < max_cells, seg_c, -1).astype(jnp.int32)
    )

    keys = jnp.where(cell_valid, cx * _P1 + cy * _P2 + cz * _P3, _SENTINEL)
    keys2 = _hash2_parts(cx, cy, cz)
    dt = build_direct_table(
        keys, keys2, cell_valid, jnp.arange(max_cells, dtype=jnp.int32)
    )
    return CellTable(cx, cy, cz, cell_valid, point_cell, dt)


def cell_neighbor_index(table: CellTable) -> jax.Array:
    """(V,27) index of each cell's 26-neighborhood (+self) into the table,
    -1 where the neighbor cell is unoccupied. Direct-table lookup (4 packed
    probes) instead of a 16-step binary search."""
    nx = table.cx[:, None] + _OFF1[None, :]
    ny = table.cy[:, None] + _OFF2[None, :]
    nz = table.cz[:, None] + _OFF3[None, :]
    h1 = nx * _P1 + ny * _P2 + nz * _P3
    h2 = _hash2_parts(nx, ny, nz)
    found, row = direct_lookup(table.dt, h1, h2)
    found &= table.cell_valid[:, None]
    return jnp.where(found, row, -1)


def anchored_window_moments(
    xyz: jax.Array,
    valid: jax.Array,
    table: CellTable,
    nbr: jax.Array,
    cell_size,
):
    """27-cell window second-order moments about each cell's OWN anchor.

    Accumulating E[x^2]-E[x]^2 on raw world coordinates catastrophically
    cancels in float32 beyond ~30 m from the origin (eps*|x|^2 rivals the
    surface variance), which silently corrupts plane normals at LiDAR map
    scale. Here every cell accumulates moments of (p - anchor_c) with
    anchor_c = cell_coord * cell_size (coords bounded by the cell pitch),
    and neighbor sums are re-anchored with the EXACT parallel-axis shift
    Delta = offset * cell_size during window aggregation.

    Returns (anchors (3,V), moments tuple (cnt, sx, sy, sz, sxx, sxy, sxz,
    syy, syz, szz) about each cell's anchor).
    """
    dtype = xyz.dtype
    Vn = table.cx.shape[0]
    cs = jnp.asarray(cell_size, dtype)
    pc = table.point_cell
    in_cell = valid & (pc >= 0)
    pcs = jnp.maximum(pc, 0)
    ax = table.cx[pcs].astype(dtype) * cs
    ay = table.cy[pcs].astype(dtype) * cs
    az = table.cz[pcs].astype(dtype) * cs
    qx = xyz[:, 0] - ax
    qy = xyz[:, 1] - ay
    qz = xyz[:, 2] - az

    m = in_cell.astype(dtype)
    seg = jnp.where(in_cell, pc, Vn)

    # ONE (N,10) row-scatter: TPU scatter-add pays per row, not per element
    vals = jnp.stack(
        [
            m,
            qx * m, qy * m, qz * m,
            qx * qx * m, qx * qy * m, qx * qz * m,
            qy * qy * m, qy * qz * m, qz * qz * m,
        ],
        axis=1,
    )  # (N, 10)
    mom = jax.ops.segment_sum(vals, seg, num_segments=Vn + 1)[:Vn]
    # (V, 10), anchored per cell

    nbr_safe = jnp.maximum(nbr, 0)
    has = (nbr >= 0).astype(dtype)  # (V,27)
    # one 16-lane record gather per neighbor instead of a 10-row strided
    # gather (rows are what a TPU gather pays for — see pack_records)
    Vp = -(-Vn // 8) * 8
    momp = jnp.pad(mom, ((0, Vp - Vn), (0, 6))).reshape(Vp // 8, 128)
    rec = gather_records(momp, nbr_safe.reshape(-1), 16, 10)  # (V*27, 10)
    g = [rec[:, i].reshape(Vn, 27) for i in range(10)]  # lane slices, fusable

    # parallel-axis shift: neighbor j's sums are about a_j = a_i + D,
    # D = offset * cell_size; re-anchor to a_i: q_i = q_j + D.
    Dx = _OFF1.astype(dtype) * cs  # (27,)
    Dy = _OFF2.astype(dtype) * cs
    Dz = _OFF3.astype(dtype) * cs
    n_j = g[0]
    sx_j, sy_j, sz_j = g[1], g[2], g[3]

    def tot(a):
        return jnp.sum(a * has, axis=1)

    cnt = tot(n_j)
    sx = tot(sx_j + n_j * Dx)
    sy = tot(sy_j + n_j * Dy)
    sz = tot(sz_j + n_j * Dz)
    sxx = tot(g[4] + 2.0 * Dx * sx_j + n_j * Dx * Dx)
    sxy = tot(g[5] + Dx * sy_j + Dy * sx_j + n_j * Dx * Dy)
    sxz = tot(g[6] + Dx * sz_j + Dz * sx_j + n_j * Dx * Dz)
    syy = tot(g[7] + 2.0 * Dy * sy_j + n_j * Dy * Dy)
    syz = tot(g[8] + Dy * sz_j + Dz * sy_j + n_j * Dy * Dz)
    szz = tot(g[9] + 2.0 * Dz * sz_j + n_j * Dz * Dz)

    anchors = (
        table.cx.astype(dtype) * cs,
        table.cy.astype(dtype) * cs,
        table.cz.astype(dtype) * cs,
    )
    return anchors, (cnt, sx, sy, sz, sxx, sxy, sxz, syy, syz, szz)
