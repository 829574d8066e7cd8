"""TLS-GNC scan-to-map registration — the numerical core of the framework.

TPU-native replacement for the reference's Ceres-based ``LocalRegistration``
(reference: src/models/registration/registration.cpp:182-1133). The entire
solve — correspondence search, local line/plane fitting, residual/Jacobian
evaluation, 6x6 normal-equation reduction, SE(3) update, GNC schedule, and
convergence test — runs as ONE jitted XLA program per frame:

  reference mechanism                       -> this module
  -------------------------------------------------------------------------
  4 KDTreeFlann builds (omp sections,          4 sorted voxel-hash grids
    registration.cpp:892-915)                  (ops/voxel.build_hash_grid)
  per-point SearchHybrid + std::async          one batched query_knn per
    factor builders (:427-845)                 family, fully data-parallel
  per-correspondence fitBestPlane /            masked closed-form 3x3 eigen
    SelfAdjointEigenSolver (:303-368,476-479)  fits (ops/eig3)
  Ceres DENSE_QR + SUBSPACE_DOGLEG, 4 inner    damped Gauss-Newton: fused
    iterations (:1036-1047)                    JᵀJ/Jᵀr einsum reduction +
                                               6x6 solve, lax.scan(4)
  GNC weight threads (:1053-1086)              vectorized weight update
  outer loop ≤4 iters, planar-only             lax.while_loop with early
    convergence gate (:966,1108-1111)          exit on the same gate

Reference quirks reproduced on purpose (SURVEY.md §hard-parts e):
  * GNC bookkeeping cost is (Σ residual components)² for 3-residual
    families and r² for point-to-plane (registration.cpp:32,69,101,143).
  * Convergence tests ONLY the planar cost delta (registration.cpp:1108).
  * mu ramp mu *= exp((iter+1)·gnc_factor) (registration.cpp:1089).
  * mu init (registration.cpp:1027-1033): see TLSConfig.mu_init — the
    reference reads the residual buffers while they are still
    zero-initialized, so it always starts at mu=1e-10; "residual" mode
    instead seeds mu from the max residual of the first fine round's
    CONVERGED solution (GNC-TLS proper).
  * correspondence caps per family keep the FIRST maxnum valid matches in
    scan order (registration.cpp:448,538,592,679,735); the sphere counter
    additionally ticks for no-neighbor points (registration.cpp:551), so its
    cap can bind earlier — reproduced via _cap_first_n(also_count=...).
  * cost==0 correspondences keep their previous weight (:862).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tloam_tpu.cloud import Cloud
from tloam_tpu.config import TLSConfig
from tloam_tpu.ops import eig3, residuals as res, se3, voxel


class FeatureSet(NamedTuple):
    """The four feature classes a frame contributes to registration."""

    edge: Cloud
    sphere: Cloud
    planar: Cloud
    ground: Cloud

    def transform(self, T: jax.Array) -> "FeatureSet":
        return FeatureSet(*(c.transform(T) for c in self))


class Diagnostics(NamedTuple):
    iterations: jax.Array  # outer GNC iterations executed
    mu: jax.Array
    costs: jax.Array  # (4,) final [planar, ground, edge, sphere] cost sums
    num_corr: jax.Array  # (4,) correspondence counts at the last iteration
    degenerate: jax.Array  # () bool — too few correspondences; pose fell
    # back to the motion-model prediction (reference aborts instead,
    # registration.cpp:928-929)
    # () bool — no GNC round ever passed the alignment gate; the pose fell
    # back to the motion-model prediction (see TLSConfig.misaligned_fallback)
    misaligned: jax.Array | None = None
    # () bool — no GNC round ever passed the alignment gate, regardless of
    # starvation/fallback. Strictly implied by `misaligned`; the distinction
    # matters for frames matching ABOVE fallback_frac: their converged pose
    # is kept (vetoing it would dead-reckon through turns) but it must NOT
    # be trusted to extend the submap (measured, SWEEP_r04 route-a seed 2:
    # one never-aligned post-occlusion frame that converged +7.9 deg off yet
    # matched 24% of candidates was pushed, locking 8 deg/100 m of rotation
    # error into every subsequent solve).
    never_aligned: jax.Array | None = None
    # Per-round solve trace (rows = GNC outer rounds, up to max_iterations;
    # rounds not executed stay zero): correspondence counts per family,
    # mean planar cost after the round's inner solve, whether the round
    # matched against the coarse grid, and whether its converged solution
    # passed the alignment gate. The per-frame observability that made the
    # f12-class "solve walks away from a good prediction" failures
    # diagnosable at all.
    corr_trace: jax.Array | None = None  # (max_iter, 4) int32
    cost_trace: jax.Array | None = None  # (max_iter,) mean planar cost
    coarse_trace: jax.Array | None = None  # (max_iter,) bool
    aligned_trace: jax.Array | None = None  # (max_iter,) bool
    # Per-frame DCVC cluster AABBs, attached by the pipeline step (the
    # reference publishes them, segmentation.cpp:1032-1078); None when the
    # solver is called standalone.
    box_min: jax.Array | None = None
    box_max: jax.Array | None = None
    box_valid: jax.Array | None = None
    num_clusters: jax.Array | None = None


class _Corr(NamedTuple):
    """Per-family correspondence buffers (fixed shapes = scan capacities).

    In point-to-plane mode plane_n/plane_d hold the fitted plane; in gicp
    mode plane_n holds the TARGET point and the *_cov fields the regularized
    covariances (plane_d unused)."""

    plane_n: jax.Array  # planar: (Np,3) plane normals (or gicp target pts)
    plane_d: jax.Array  # (Np,)
    plane_valid: jax.Array  # (Np,)
    ground_n: jax.Array
    ground_d: jax.Array
    ground_valid: jax.Array
    edge_a: jax.Array  # (Ne,3)
    edge_b: jax.Array
    edge_valid: jax.Array
    sphere_t: jax.Array  # (Ns,3) target points
    sphere_valid: jax.Array
    plane_tgt_cov: jax.Array | None = None  # gicp: (Np,3,3)
    ground_tgt_cov: jax.Array | None = None
    plane_src_cov: jax.Array | None = None
    ground_src_cov: jax.Array | None = None


def calculate_covariances(
    cloud: Cloud, k_corr: int, radius: float = 1.0, max_per_cell: int = 8,
    chunk_size: int | None = None,
) -> jax.Array:
    """Per-point regularized neighborhood covariances for GICP (reference
    calculateCov, registration.cpp:385-415): kNN(k_corr+1) skipping self,
    covariance, eigenvalues normalized by the max and clamped at 1e-3, then
    reassembled — note the reference divides by the max eigenvalue, so the
    output covariance is scale-free with unit largest eigenvalue."""
    grid = voxel.build_hash_grid(cloud.xyz, cloud.valid, radius)
    idx, _, ok = voxel.query_knn(
        grid, cloud.xyz, cloud.valid, k=k_corr + 1, radius=radius,
        max_per_cell=max_per_cell, chunk_size=chunk_size,
    )
    # drop the self slot (nearest, distance 0)
    idx, ok = idx[:, 1:], ok[:, 1:]
    m = ok.astype(cloud.xyz.dtype)
    cnt = jnp.maximum(jnp.sum(m, axis=-1), 1.0)
    xs, ys, zs = voxel.gather_planes(cloud.xyz, idx)
    # center on the query point: raw-coordinate second moments cancel
    # catastrophically in f32 at map scale (see voxel.anchored_window_moments)
    xs = xs - cloud.xyz[:, 0:1]
    ys = ys - cloud.xyz[:, 1:2]
    zs = zs - cloud.xyz[:, 2:3]
    xs, ys, zs = xs * m, ys * m, zs * m
    mx, my, mz = (jnp.sum(a, -1) / cnt for a in (xs, ys, zs))
    a00 = jnp.sum(xs * xs, -1) / cnt - mx * mx
    a01 = jnp.sum(xs * ys, -1) / cnt - mx * my
    a02 = jnp.sum(xs * zs, -1) / cnt - mx * mz
    a11 = jnp.sum(ys * ys, -1) / cnt - my * my
    a12 = jnp.sum(ys * zs, -1) / cnt - my * mz
    a22 = jnp.sum(zs * zs, -1) / cnt - mz * mz
    cov = jnp.stack(
        [
            jnp.stack([a00, a01, a02], -1),
            jnp.stack([a01, a11, a12], -1),
            jnp.stack([a02, a12, a22], -1),
        ],
        axis=-2,
    )
    w, V = eig3.eigh3(cov)
    w_max = jnp.maximum(w[..., 2:3], 1e-12)
    w_reg = jnp.maximum(w / w_max, 1e-3)
    # Middle-eigenvalue floor (TPU-build containment; the reference clamps
    # all three at 1e-3, calculateCov registration.cpp:404-409): LiDAR
    # ground points at far range have LINE-like neighborhoods (one ring arc
    # inside the kNN radius), whose normalized eigenvalues (1e-3, 1e-3, 1)
    # make the GICP information matrix weight BOTH perpendicular directions
    # at ~500 — including along-track — on aliased near-zero residuals.
    # Measured (round 4): 2000 ground points contributed H_xx ~ 4.6e7 of
    # pure "stay put" against the cross-facades' 4.6e5 of real signal, and
    # the gicp pipeline froze at its initial pose on EVERY drive. A point
    # is allowed one sharp direction (its surface normal), not two.
    w_reg = w_reg.at[..., 1].max(0.1)
    out = jnp.einsum("nij,nj,nkj->nik", V, w_reg, V)
    # Points without a usable neighborhood (the reference's unbounded kNN
    # always finds k) fall back to the isotropic unit covariance.
    degenerate = (jnp.sum(m, axis=-1) < 3) | (w[..., 2] < 1e-9)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=out.dtype), out.shape)
    return jnp.where(degenerate[:, None, None], eye, out)


def _cap_first_n(
    valid: jax.Array,
    maxnum: int,
    also_count: jax.Array | None = None,
    axis_name: str | None = None,
) -> jax.Array:
    """Keep only the first `maxnum` counted entries in scan order (reference
    caps, registration.cpp:448 etc.). `also_count` marks entries that consume
    cap budget without producing a match — the sphere family's counter
    increments for no-neighbor points too (registration.cpp:551: sphere_sum++
    sits outside the match branch, skipped only by the dist>0.2 continue).

    Under shard_map (`axis_name` set, point buffers sharded contiguously),
    the cap binds on the GLOBAL scan-order index: each shard offsets its
    local prefix count by the totals of all preceding shards, so an N-way
    sharded solve admits exactly the same correspondences as single-device
    even when the cap binds."""
    counted = valid if also_count is None else (valid | also_count)
    ci = counted.astype(jnp.int32)
    before = jnp.cumsum(ci) - ci
    if axis_name is not None:
        totals = jax.lax.all_gather(jnp.sum(ci), axis_name)  # (n_shards,)
        idx = jax.lax.axis_index(axis_name)
        prev = jnp.sum(
            jnp.where(jnp.arange(totals.shape[0]) < idx, totals, 0)
        )
        before = before + prev
    return valid & (before < maxnum)


# ---------------------------------------------------------------------------
# Cell-plane correspondence cache (corr_mode="cell_plane")
# ---------------------------------------------------------------------------


class _SurfCells(NamedTuple):
    """Per-cell precomputed surface geometry over a submap feature cloud.

    The submap is constant for the whole GNC solve, so window plane/line
    fits are computed ONCE here; each iteration's correspondence search is
    8 block probes + 8 block-row record fetches per query — every candidate
    record lands in registers, so the nearest-centroid pick and the winner's
    full record need NO further gathers (the TPU-fast replacement for the
    reference's per-point SearchHybrid + fitBestPlane per iteration).

    surf: (B, 128) Morton-block store (voxel.scatter_cell_records), 8 cell
      slots x 16 lanes: lanes 0-2 window centroid, 3-5 plane normal, 6 plane
      d, 7-9 line direction, 10 ok_plane, 11 ok_line, 12 occupied.
    """

    bt: voxel.BlockTable
    surf: jax.Array
    cell_size: jax.Array


def _build_surf_cells(
    cloud: Cloud, cell_size, max_cells: int, precise_thres: float = 0.2,
    line_mode: str = "window",
) -> _SurfCells:
    """Window (27-cell) moment aggregation -> plane + line fits per cell.

    Plane uses the reference's weighted-axis formula (fitBestPlane,
    registration.cpp:303-368) on the window moments; the precision gate
    approximates "every neighbor within 0.2 of the plane"
    (registration.cpp:606-612) by 2*sqrt(lambda0) <= 0.2.

    line_mode="cell" fits the line (and its matching centroid) from each
    cell's OWN moments instead of the 3-cell window: a window at the edge
    grid's 1 m pitch spans 3 m and regularly covers several distinct
    vertical structures (two building corners, a pole + a corner), whose
    merged covariance is horizontal — failing both the lam2 > 3*lam1 and the
    |dir_z| gates. That is the measured reason the edge family dropped to 0
    correspondences on whole frames (BENCH_r02 corr_min). Per-cell fits
    have the locality of the reference's 5-NN line fit
    (registration.cpp:449-480)."""
    from tloam_tpu.models.segmentation import weighted_axis_plane

    dtype = cloud.xyz.dtype
    bt = voxel.build_block_table(cloud.xyz, cloud.valid, cell_size, max_cells)

    # anchored moments: raw-coordinate E[x^2]-E[x]^2 cancels catastrophically
    # in f32 at map scale — see voxel.anchored_window_moments
    (anx, any_, anz), mw, _, cellm = voxel.block_window_moments(
        cloud.xyz, cloud.valid, bt, cell_size, return_cell=True
    )
    w_cnt, sx, sy, sz, mxx, mxy, mxz, myy, myz, mzz = mw
    cnt = jnp.maximum(w_cnt, 1.0)

    moments10 = jnp.stack(
        [sx, sy, sz, mxx, mxy, mxz, myy, myz, mzz, w_cnt], axis=-1
    )
    plane = weighted_axis_plane(moments10)  # (V,4) fit in anchored coords
    # re-express the plane in world coords: n.(p - a) + d_rel = 0
    plane = plane.at[:, 3].add(
        -(plane[:, 0] * anx + plane[:, 1] * any_ + plane[:, 2] * anz)
    )

    cenx_r, ceny_r, cenz_r = sx / cnt, sy / cnt, sz / cnt
    cenx, ceny, cenz = anx + cenx_r, any_ + ceny_r, anz + cenz_r
    a00 = mxx / cnt - cenx_r * cenx_r
    a01 = mxy / cnt - cenx_r * ceny_r
    a02 = mxz / cnt - cenx_r * cenz_r
    a11 = myy / cnt - ceny_r * ceny_r
    a12 = myz / cnt - ceny_r * cenz_r
    a22 = mzz / cnt - cenz_r * cenz_r
    lam0, lam1, lam2 = eig3.eigvalsh3_soa(a00, a01, a02, a11, a12, a22)

    if line_mode == "cell":
        c_cnt = cellm[:, 0]
        ccd = jnp.maximum(c_cnt, 1.0)
        cmx, cmy, cmz = cellm[:, 1] / ccd, cellm[:, 2] / ccd, cellm[:, 3] / ccd
        c00 = cellm[:, 4] / ccd - cmx * cmx
        c01 = cellm[:, 5] / ccd - cmx * cmy
        c02 = cellm[:, 6] / ccd - cmx * cmz
        c11 = cellm[:, 7] / ccd - cmy * cmy
        c12 = cellm[:, 8] / ccd - cmy * cmz
        c22 = cellm[:, 9] / ccd - cmz * cmz
        cl0, cl1, cl2 = eig3.eigvalsh3_soa(c00, c01, c02, c11, c12, c22)
        dirx, diry, dirz = eig3.eigvec_soa(c00, c01, c02, c11, c12, c22, cl2)
        # the matching centroid is the cell's own (lanes 0-2)
        cenx, ceny, cenz = anx + cmx, any_ + cmy, anz + cmz
        ok_line = bt.cell_valid & (c_cnt >= 4) & (cl2 > 3.0 * cl1)
    else:
        dirx, diry, dirz = eig3.eigvec_soa(a00, a01, a02, a11, a12, a22, lam2)
        ok_line = bt.cell_valid & (w_cnt >= 4) & (lam2 > 3.0 * lam1)

    precise = 2.0 * jnp.sqrt(jnp.maximum(lam0, 0.0)) <= precise_thres
    ok_plane = bt.cell_valid & (w_cnt >= 5) & precise
    # edge gates: >=4 pts and lam_max > 3*lam_mid (registration.cpp:445,481)

    surf = jnp.stack(
        [
            cenx, ceny, cenz,
            plane[:, 0], plane[:, 1], plane[:, 2], plane[:, 3],
            dirx, diry, dirz,
            ok_plane.astype(dtype), ok_line.astype(dtype),
            bt.cell_valid.astype(dtype),  # lane 12: occupancy
        ],
        axis=1,
    )  # (V, 13)
    return _SurfCells(
        bt=bt,
        surf=voxel.scatter_cell_records(bt, surf, 16),
        cell_size=jnp.asarray(cell_size, dtype),
    )


_QSEL = None  # lazily-built constant lane-selection matrices


def _qsel_consts(dtype):
    """Constant matrices for the lane-layout surf-cell query (see
    _query_surf_cells): P (3,128) broadcasts scan coords onto record
    coordinate lanes; CMASK/OMASK (128,) select coord / occupancy lanes;
    S (128,8) sums each slot's 4 scoring lanes; M (128,16) collapses one
    masked slot group to its 16 record fields."""
    import numpy as _np

    P = _np.zeros((3, 128), _np.float32)
    CM = _np.zeros((128,), _np.float32)
    OM = _np.zeros((128,), _np.float32)
    S = _np.zeros((128, 8), _np.float32)
    M = _np.zeros((128, 16), _np.float32)
    for l in range(128):
        s, f = l >> 4, l & 15
        M[l, f] = 1.0
        if f < 3:
            P[f, l] = 1.0
            CM[l] = 1.0
            S[l, s] = 1.0
        if f == 12:
            OM[l] = 1.0
            S[l, s] = 1.0
    return tuple(jnp.asarray(a, dtype) for a in (P, CM, OM, S, M))


def _query_surf_cells(cells: _SurfCells, scan_w: jax.Array, scan_valid: jax.Array):
    """8 block probes + 8 block-row fetches -> the matched cell with the
    nearest window centroid, its full record already in registers. Returns
    data (16, Q) for the best cell per query plus (found (Q,), centroid
    distance (Q,)).

    Everything is computed in the fetched rows' NATIVE (Q, 8, 128) lane
    layout: candidate distances come from a masked lane-diff + an MXU slot
    reduction, and the winner's record from a one-hot row/group select + a
    (128,16) collapse matmul. The previous (Q,64,16) formulation forced two
    full layout transposes of a ~4M-element tensor per family per GNC round
    (~1.8 ms/frame on the ground family alone — r5 HLO profile)."""
    Q = scan_w.shape[0]
    dtype = scan_w.dtype
    P, CMASK, OMASK, S, M = _qsel_consts(dtype)
    qc = jnp.floor(scan_w / cells.cell_size).astype(jnp.int32)
    rows, found, _, window = voxel.block_window_probe(
        cells.bt, qc[:, 0], qc[:, 1], qc[:, 2]
    )  # window: (Q,64) bool, candidate c = e*8 + s
    r = jnp.take(cells.surf, jnp.where(found, rows, 0), axis=0)  # (Q,8,128)
    r = r * found[:, :, None].astype(dtype)

    # scan coords broadcast onto the coordinate lanes of every slot
    qb = jax.lax.dot_general(
        scan_w, P, (((1,), (0,)), ((), ())), preferred_element_type=dtype
    )  # (Q,128)
    diff = r - qb[:, None, :]
    K = jnp.asarray(1e12, dtype)
    # per-lane score: coord lanes carry squared diffs; each slot's occupancy
    # lane carries a huge penalty when the cell is empty (record 0.0)
    contrib = diff * diff * CMASK + (K - K * r) * OMASK  # (Q,8,128)
    dsq = jax.lax.dot_general(
        contrib.reshape(Q * 8, 128), S, (((1,), (0,)), ((), ())),
        preferred_element_type=dtype,
    ).reshape(Q, 64)  # candidate c = e*8 + s
    BIG = jnp.asarray(jnp.finfo(dtype).max, dtype)
    dist_sq = jnp.where(window & scan_valid[:, None], dsq, BIG)
    best = jnp.argmin(dist_sq, axis=1)  # (Q,)
    best_d = jnp.min(dist_sq, axis=1)
    ok = best_d < K * 0.5  # occupancy-penalized candidates are not matches

    # winner record: one-hot block select + slot-group mask + field collapse
    e_best, s_best = best >> 3, best & 7
    eoh = (
        e_best[:, None] == jnp.arange(8, dtype=jnp.int32)[None, :]
    ).astype(dtype)
    bestrow = jnp.einsum("qe,qel->ql", eoh, r)  # (Q,128)
    lane = jnp.arange(128, dtype=jnp.int32)
    grp = ((lane[None, :] >> 4) == s_best[:, None]).astype(dtype)
    best_data = jax.lax.dot_general(
        bestrow * grp, M, (((1,), (0,)), ((), ())), preferred_element_type=dtype
    ).T  # (16, Q)
    best_d = jnp.where(ok, best_d, 0.0)
    return best_data, ok, jnp.sqrt(jnp.maximum(best_d, 0.0))


def _plane_correspondences_cell(
    cells: _SurfCells,
    scan_w: jax.Array,
    scan_valid: jax.Array,
    dist_thres: float,
    maxnum: int,
    axis_name: str | None = None,
    gate_scale: float = 1.0,
):
    data, ok, cen_dist = _query_surf_cells(cells, scan_w, scan_valid)
    nrm = jnp.stack([data[3], data[4], data[5]], axis=-1)
    d = data[6]
    # gate in units of the matched grid's OWN cell size, so a coarse grid
    # (coarse_scale) gates proportionally wider
    valid = (
        scan_valid & ok & (data[10] > 0.5)
        & (cen_dist <= gate_scale * cells.cell_size)
    )
    return nrm, d, _cap_first_n(valid, maxnum, axis_name=axis_name)


def _edge_correspondences_cell(
    cells: _SurfCells,
    scan_w: jax.Array,
    scan_valid: jax.Array,
    cfg: TLSConfig,
    axis_name: str | None = None,
):
    data, ok, cen_dist = _query_surf_cells(cells, scan_w, scan_valid)
    cen = jnp.stack([data[0], data[1], data[2]], axis=-1)
    direction = jnp.stack([data[7], data[8], data[9]], axis=-1)
    valid = (
        scan_valid
        & ok
        & (data[11] > 0.5)
        & (jnp.abs(direction[:, 2]) > cfg.edge_dir_thres)
        & (cen_dist <= cfg.cell_gate_scale * cfg.edge_dist_thres)
    )
    a = cen + 0.1 * direction
    b = cen - 0.1 * direction
    return a, b, _cap_first_n(valid, cfg.edge_maxnum, axis_name=axis_name)


def _yaw_fan(
    xi: jax.Array,
    scan: FeatureSet,
    cells: _SurfCells,
    cfg: TLSConfig,
    axis_name: str | None = None,
) -> jax.Array:
    """Yaw-hypothesis fan (TLSConfig.yaw_fan_half): score a bank of yaw
    offsets about `xi` by truncated planar point-to-plane cost against the
    COARSE cell grid and return xi rotated to the best hypothesis.

    This is the basin-escape step Gauss-Newton cannot take: at turn onset
    the fine/coarse rounds both converge back to the unrotated local
    minimum (near points slide freely along Manhattan walls; the distant
    points that observe yaw are unmatched). A 5-hypothesis fan at 3-degree
    pitch covers a missed 0.098 rad/frame turn step in one evaluation.
    Unmatched candidates pay tau^2, so the score ranks robust whole-scan
    alignment rather than matched-subset residuals."""
    dtype = xi.dtype
    step = jnp.asarray(jnp.deg2rad(cfg.yaw_fan_step_deg), dtype)
    offs = jnp.arange(-cfg.yaw_fan_half, cfg.yaw_fan_half + 1).astype(dtype) * step
    tau_sq = jnp.asarray(cfg.yaw_fan_tau**2, dtype)
    T0 = se3.exp(xi)

    def body_yaw(d):
        # heading change IN PLACE: right-multiply by a body-z rotation
        # (a left/world-frame yaw would swing the position about the world
        # origin — metres of translation at map scale)
        return T0 @ se3.exp(jnp.zeros(6, dtype).at[5].set(d))

    def score_one(d):
        pw = se3.transform(body_yaw(d), scan.planar.xyz)
        n, pd, pv = _plane_correspondences_cell(
            cells, pw, scan.planar.valid, cfg.planar_dist_thres,
            cfg.planar_maxnum, axis_name, 1.5,
        )
        r = jnp.einsum("nj,nj->n", pw, n) + pd
        c = jnp.where(pv, jnp.minimum(r * r, tau_sq), tau_sq)
        return _psum(jnp.sum(jnp.where(scan.planar.valid, c, 0.0)), axis_name)

    scores = jax.vmap(score_one)(offs)
    # margin test vs the zero-offset hypothesis (see yaw_fan_margin): accept
    # a rotation only when it wins DECISIVELY — marginal wins are Manhattan
    # aliasing or dynamic-object structure, and acting on them injects the
    # very yaw error the fan exists to remove
    s0 = scores[cfg.yaw_fan_half]
    best = jnp.argmin(scores)
    take = scores[best] < cfg.yaw_fan_margin * s0
    best_off = jnp.where(take, offs[best], jnp.asarray(0.0, dtype))
    return se3.log(body_yaw(best_off))


def _plane_correspondences(
    grid: voxel.HashGrid,
    submap: Cloud,
    scan_w: jax.Array,
    scan_valid: jax.Array,
    dist_thres: float,
    maxnum: int,
    max_per_cell: int,
    axis_name: str | None = None,
):
    """Shared planar/ground path: 5-NN -> plane fit -> validity gates
    (reference addSurfCostFactor/addGroundCostFactor, registration.cpp:571-778)."""
    idx, _, ok = voxel.query_knn(
        grid, scan_w, scan_valid, k=5, radius=dist_thres, max_per_cell=max_per_cell
    )
    pts = submap.xyz[idx]  # (N,5,3)
    n_neigh = jnp.sum(ok, axis=-1)
    nrm, d, _ = eig3.plane_from_points(pts, ok)
    # Gate: need all 5 neighbors (size()<=4 -> skip, registration.cpp:589) and
    # plane precision: signed distance of every neighbor <= 0.2 (the reference
    # checks the SIGNED value, registration.cpp:606-612 — reproduced).
    plane_dis = jnp.einsum("nkj,nj->nk", pts, nrm) + d[:, None]
    precise = jnp.all(jnp.where(ok, plane_dis <= 0.2, True), axis=-1)
    valid = scan_valid & (n_neigh >= 5) & precise
    return nrm, d, _cap_first_n(valid, maxnum, axis_name=axis_name)


def _edge_correspondences(
    grid: voxel.HashGrid,
    submap: Cloud,
    scan_w: jax.Array,
    scan_valid: jax.Array,
    cfg: TLSConfig,
    axis_name: str | None = None,
):
    """Edge path: 5-NN -> line fit -> direction gates -> (a, b) endpoints
    (reference addEdgeCostFactor, registration.cpp:427-505)."""
    idx, _, ok = voxel.query_knn(
        grid,
        scan_w,
        scan_valid,
        k=5,
        radius=cfg.edge_dist_thres,
        max_per_cell=cfg.max_per_cell,
    )
    pts = submap.xyz[idx]
    n_neigh = jnp.sum(ok, axis=-1)
    center, direction, is_line = eig3.line_from_points(pts, ok)
    # Gates: >3 neighbors (registration.cpp:445), lam2 > 3 lam1 (in is_line),
    # |dir_z| > edge_dir_thres (vertical structures, registration.cpp:481).
    valid = (
        scan_valid
        & (n_neigh >= 4)
        & (is_line > 0.5)
        & (jnp.abs(direction[:, 2]) > cfg.edge_dir_thres)
    )
    a = center + 0.1 * direction
    b = center - 0.1 * direction
    return a, b, _cap_first_n(valid, cfg.edge_maxnum, axis_name=axis_name)


def _sphere_correspondences(
    grid: voxel.HashGrid,
    submap: Cloud,
    scan_w: jax.Array,
    scan_valid: jax.Array,
    cfg: TLSConfig,
    axis_name: str | None = None,
):
    """Sphere path: 1-NN with squared-distance gate 0.2 (reference
    addSphereCostFactor, registration.cpp:517-559; Open3D KD distances are
    SQUARED, so the 0.2 gate is on dist², reproduced)."""
    idx, dist_sq, ok = voxel.query_knn(
        grid,
        scan_w,
        scan_valid,
        k=1,
        radius=cfg.sphere_dist_thres,
        max_per_cell=cfg.max_per_cell,
    )
    tgt = submap.xyz[idx[:, 0]]
    valid = scan_valid & ok[:, 0] & (dist_sq[:, 0] <= 0.2)
    # no-neighbor points consume cap budget too (registration.cpp:551)
    no_hit = scan_valid & ~ok[:, 0]
    return tgt, _cap_first_n(
        valid, cfg.sphere_maxnum, also_count=no_hit, axis_name=axis_name
    )


def _gicp_correspondences(
    grid: voxel.HashGrid,
    submap: Cloud,
    submap_covs: jax.Array,
    scan_w: jax.Array,
    scan_valid: jax.Array,
    dist_thres: float,
    maxnum: int,
    max_per_cell: int,
    axis_name: str | None = None,
):
    """1-NN GICP correspondence (reference addSurfCostFactor2/
    addGroundCostFactor2, registration.cpp:649-702,792-845: plain nearest
    neighbor within the distance threshold, no plane-fit gate)."""
    idx, _, ok = voxel.query_knn(
        grid, scan_w, scan_valid, k=1, radius=dist_thres, max_per_cell=max_per_cell
    )
    tgt = submap.xyz[idx[:, 0]]
    tgt_cov = submap_covs[idx[:, 0]]
    valid = scan_valid & ok[:, 0]
    return tgt, tgt_cov, _cap_first_n(valid, maxnum, axis_name=axis_name)


def _build_correspondences(
    xi: jax.Array,
    scan: FeatureSet,
    submap: FeatureSet,
    grids: dict,
    cfg: TLSConfig,
    gicp_covs: dict | None = None,
    axis_name: str | None = None,
    use_coarse: jax.Array | None = None,
) -> _Corr:
    # adaptive coarse re-localization: when the PREVIOUS GNC round starved
    # (use_coarse), this round matches ground AND planar against grids built
    # at coarse_scale x the cell pitch (same array shapes — a pure jnp.where
    # pytree select), recovering correspondences when the pose is metres off
    # (sharp-turn onset, post-occlusion loss). Healthy frames never take a
    # coarse round, so their trajectory is bit-identical. The coarse round's
    # costs never touch the GNC weights or mu (see outer_body) — coarse-
    # plane residuals would poison the schedule.
    planar_gate_scale = cfg.cell_gate_scale
    if use_coarse is not None and "planar_coarse" in grids and gicp_covs is None:
        # PLANAR only: the lost-tracking signature is planar corr == 0
        # (ground is horizontally homogeneous — it matches at fine reach
        # even metres off-pose, so a coarse ground round adds nothing for
        # the xy/yaw error that actually needs fixing). On coarse rounds the
        # centroid gate opens to the full 27-window reach (1.5 cells): a
        # coarse window's centroid legitimately sits far from the matching
        # facade point.
        grids = {
            **grids,
            "planar": jax.tree.map(
                lambda a, b: jnp.where(use_coarse, a, b),
                grids["planar_coarse"], grids["planar"],
            ),
        }
        planar_gate_scale = jnp.where(use_coarse, 1.5, cfg.cell_gate_scale)
    T = se3.exp(xi)
    planar_w = se3.transform(T, scan.planar.xyz)
    ground_w = se3.transform(T, scan.ground.xyz)
    edge_w = se3.transform(T, scan.edge.xyz)
    sphere_w = se3.transform(T, scan.sphere.xyz)

    if gicp_covs is None:
        if cfg.corr_mode == "cell_plane":
            pn, pd, pv = _plane_correspondences_cell(
                grids["planar"], planar_w, scan.planar.valid,
                cfg.planar_dist_thres, cfg.planar_maxnum, axis_name,
                planar_gate_scale,
            )
            gn, gd, gv = _plane_correspondences_cell(
                grids["ground"], ground_w, scan.ground.valid,
                cfg.ground_dist_thres, cfg.ground_maxnum, axis_name,
                cfg.cell_gate_scale,
            )
        else:
            pn, pd, pv = _plane_correspondences(
                grids["planar"], submap.planar, planar_w, scan.planar.valid,
                cfg.planar_dist_thres, cfg.planar_maxnum, cfg.max_per_cell,
                axis_name,
            )
            gn, gd, gv = _plane_correspondences(
                grids["ground"], submap.ground, ground_w, scan.ground.valid,
                cfg.ground_dist_thres, cfg.ground_maxnum, cfg.max_per_cell,
                axis_name,
            )
        covs = {}
    else:
        pn, p_cov, pv = _gicp_correspondences(
            grids["planar"], submap.planar, gicp_covs["submap_planar"],
            planar_w, scan.planar.valid, cfg.gicp_dist_thres,
            cfg.planar_maxnum, cfg.max_per_cell, axis_name,
        )
        pd = jnp.zeros(pn.shape[0], pn.dtype)
        if use_coarse is not None and "planar_coarse" in grids:
            # GICP coarse rounds: match point-to-plane against the coarse
            # cell grid, expressed in the gicp correspondence structure —
            # target = projection of the (transformed) scan point onto the
            # matched coarse plane, covariance = identity. The combined
            # GICP information matrix then constrains exactly the plane-
            # normal direction (tangential residual is zero by
            # construction), which is the basin-widening behavior coarse
            # rounds exist for. GNC weights/mu never advance on coarse
            # rounds, so the scale mismatch cannot poison the schedule.
            cn, cd, cv = _plane_correspondences_cell(
                grids["planar_coarse"], planar_w, scan.planar.valid,
                cfg.planar_dist_thres, cfg.planar_maxnum, axis_name, 1.5,
            )
            proj = planar_w - cn * (
                jnp.einsum("nj,nj->n", planar_w, cn) + cd
            )[:, None]
            eye = jnp.broadcast_to(
                jnp.eye(3, dtype=pn.dtype), p_cov.shape
            )
            pn = jnp.where(use_coarse, proj, pn)
            pv = jnp.where(use_coarse, cv, pv)
            p_cov = jnp.where(use_coarse, eye, p_cov)
        # NOTE: addGroundCostFactor2 searches ground with the PLANAR
        # threshold (registration.cpp:813) — both families share
        # gicp_dist_thres here (see its config rationale)
        gn, g_cov, gv = _gicp_correspondences(
            grids["ground"], submap.ground, gicp_covs["submap_ground"],
            ground_w, scan.ground.valid, cfg.gicp_dist_thres,
            cfg.ground_maxnum, cfg.max_per_cell, axis_name,
        )
        gd = jnp.zeros(gn.shape[0], gn.dtype)
        covs = {
            "plane_tgt_cov": p_cov,
            "ground_tgt_cov": g_cov,
            "plane_src_cov": gicp_covs["scan_planar"],
            "ground_src_cov": gicp_covs["scan_ground"],
        }
    if cfg.corr_mode == "cell_plane" and gicp_covs is None:
        ea, eb, ev = _edge_correspondences_cell(
            grids["edge"], edge_w, scan.edge.valid, cfg, axis_name
        )
    else:
        ea, eb, ev = _edge_correspondences(
            grids["edge"], submap.edge, edge_w, scan.edge.valid, cfg, axis_name
        )
    st, sv = _sphere_correspondences(
        grids["sphere"], submap.sphere, sphere_w, scan.sphere.valid, cfg, axis_name
    )
    if cfg.factor_num < 4:
        sv = jnp.zeros_like(sv)
    if cfg.factor_num < 3:
        ev = jnp.zeros_like(ev)
    return _Corr(pn, pd, pv, gn, gd, gv, ea, eb, ev, st, sv, **covs)


class _Weights(NamedTuple):
    planar: jax.Array
    ground: jax.Array
    edge: jax.Array
    sphere: jax.Array


def _evaluate(
    xi: jax.Array, scan: FeatureSet, corr: _Corr, w: _Weights,
    gicp_cauchy_scale: float = 1.0,
):
    """Residuals/Jacobians/costs for every family at pose xi.

    Returns (H (6,6), g (6,), costs _Weights-shaped pytree of per-point GNC
    costs with zeros at invalid slots).

    `gicp_cauchy_scale`: Cauchy robust-loss scale for the GICP families.
    The reference stacks CauchyLoss(1.0) on every mode
    (registration.cpp:970), but GICP residuals are covariance-normalized —
    an INLIER carries |r| ~ 5 and any real initial pose error puts the
    informative correspondences at |r| ~ 500, where CauchyLoss(1.0)'s IRLS
    weight is ~4e-6: the gradient vanishes and the solve freezes at its
    initial pose (measured: pose pinned at ~0 over an 11 m drive with 600
    live correspondences). The loss scale must live on the family's own
    residual scale (gicp_noise_bound)."""
    T = se3.exp(xi)
    dtype = xi.dtype
    H = jnp.zeros((6, 6), dtype)
    g = jnp.zeros((6,), dtype)

    # --- planar + ground: point-to-plane (1 residual row) ---
    def plane_family(cloud, n, d, valid, weights):
        r, J, cost = res.point_to_plane(T, cloud.xyz, n, d, weights)
        m = valid.astype(dtype)
        irls = res.cauchy_weight(r * r) * m
        Hf = jnp.einsum("ni,nj,n->ij", J, J, irls)
        gf = jnp.einsum("ni,n,n->i", J, r, irls)
        return Hf, gf, cost * m

    # --- edge/sphere: 3-residual families ---
    def vec_family(r, J, cost, valid):
        m = valid.astype(dtype)
        irls = res.cauchy_weight(jnp.sum(r * r, axis=-1)) * m
        Hf = jnp.einsum("nki,nkj,n->ij", J, J, irls)
        gf = jnp.einsum("nki,nk,n->i", J, r, irls)
        return Hf, gf, cost * m

    def gicp_family(cloud, tgt, src_cov, tgt_cov, valid, weights):
        r, J, cost = res.plane_to_plane(T, cloud.xyz, src_cov, tgt, tgt_cov, weights)
        m = valid.astype(dtype)
        irls = res.cauchy_weight(
            jnp.sum(r * r, axis=-1), scale=gicp_cauchy_scale
        ) * m
        Hf = jnp.einsum("nki,nkj,n->ij", J, J, irls)
        gf = jnp.einsum("nki,nk,n->i", J, r, irls)
        return Hf, gf, cost * m

    if corr.plane_tgt_cov is not None:
        Hp, gp, cost_p = gicp_family(
            scan.planar, corr.plane_n, corr.plane_src_cov, corr.plane_tgt_cov,
            corr.plane_valid, w.planar,
        )
        Hg, gg, cost_g = gicp_family(
            scan.ground, corr.ground_n, corr.ground_src_cov, corr.ground_tgt_cov,
            corr.ground_valid, w.ground,
        )
    else:
        Hp, gp, cost_p = plane_family(
            scan.planar, corr.plane_n, corr.plane_d, corr.plane_valid, w.planar
        )
        Hg, gg, cost_g = plane_family(
            scan.ground, corr.ground_n, corr.ground_d, corr.ground_valid, w.ground
        )
    r_e, J_e, c_e = res.point_to_line(
        T, scan.edge.xyz, corr.edge_a, corr.edge_b, w.edge
    )
    He, ge, cost_e = vec_family(r_e, J_e, c_e, corr.edge_valid)
    r_s, J_s, c_s = res.point_to_point(T, scan.sphere.xyz, corr.sphere_t, w.sphere)
    Hs, gs, cost_s = vec_family(r_s, J_s, c_s, corr.sphere_valid)

    H = Hp + Hg + He + Hs
    g = gp + gg + ge + gs
    costs = _Weights(cost_p, cost_g, cost_e, cost_s)
    return H, g, costs


def _gn_inner(
    xi: jax.Array,
    scan: FeatureSet,
    corr: _Corr,
    w: _Weights,
    cfg: TLSConfig,
    axis_name: str | None = None,
    hard_floor_on: jax.Array | bool = False,
    w_scale: jax.Array | float = 1.0,
) -> jax.Array:
    """Damped Gauss-Newton inner loop (replaces ceres::Solve 4 iterations,
    registration.cpp:1036-1047). With `axis_name`, the 6x6 normal equations
    are psum-reduced across the mesh before the (replicated) solve.

    `hard_floor_on`: activate the absolute degeneracy floor (see
    TLSConfig.degen_abs_hard) — passed in as "the planar family is EMPTY",
    the ground-only runaway signature. Applying the floor unconditionally
    freezes genuinely-but-weakly observed yaw at sharp-turn onset
    (measured: 1.7 m extra drift over one turn).

    `w_scale`: mean squared GNC weight over the valid correspondences. The
    absolute curvature thresholds (degen_abs_*) are meant in "unit-weight
    residual count" units; after a GNC weight update ALL weights can shrink
    uniformly (harmless to the solve direction — GN is scale-invariant — but
    it collapses raw curvature by w^2), so the raw curvature is re-normalized
    by w_scale before the threshold test. Measured on the 120-frame varied
    drive: without this, turn-onset frames (whose round-0 residuals shrink
    every weight ~100x) freeze the yaw direction for rounds 1-3."""

    gicp_scale = cfg.gicp_noise_bound if cfg.plane_residual == "gicp" else 1.0

    def step(xi, _):
        H, g, _ = _evaluate(xi, scan, corr, w, gicp_scale)
        H = _psum(H, axis_name)
        g = _psum(g, axis_name)
        # after block normalization trace(Hn) ~ 6, so the Levenberg damping
        # is simply lm_lambda on the unit scale
        damp = jnp.asarray(cfg.lm_lambda, xi.dtype)
        # Degeneracy-aware solve (solution remapping, Zhang ICRA'16): in a
        # corridor scene nothing constrains the along-track direction, H is
        # near-singular there, and a plain damped solve takes a wild step.
        # The reference survives this through Ceres' SUBSPACE_DOGLEG trust
        # region (registration.cpp:1040); here we eigen-decompose the 6x6,
        # zero the update along directions with eigenvalue < degen_rel_thres
        # * lam_max (the motion-model prediction is kept along them), and
        # clamp the step to a trust region.
        #
        # The eigen test runs on a BLOCK-NORMALIZED matrix: translation rows
        # of J are O(1) normals while rotation rows are O(r) lever arms, so
        # raw-H eigenvalue ratios conflate units with conditioning. Scaling
        # each 3-block by its mean diagonal makes "degenerate" scale-free
        # (a healthy direction sits at ~1, a starved one at ~0) while intra-
        # block anisotropy (the actual corridor degeneracy) stays visible.
        dtype = xi.dtype
        dH = jnp.diagonal(H)
        s_t = 1.0 / jnp.sqrt(jnp.maximum(jnp.mean(dH[:3]), 1e-12))
        s_r = 1.0 / jnp.sqrt(jnp.maximum(jnp.mean(dH[3:]), 1e-12))
        S = jnp.concatenate([jnp.full((3,), s_t, dtype), jnp.full((3,), s_r, dtype)])
        Hn = H * S[:, None] * S[None, :]
        lam, V = jnp.linalg.eigh(Hn)
        lam_max = jnp.maximum(lam[-1], 1e-12)
        # raw curvature along each eigen-direction: lam_hat / |S v|^2 — the
        # effective summed residual weight constraining it. A direction is
        # only treated as degenerate when it is BOTH relatively tiny and
        # absolutely unconstrained (weakly-but-genuinely observed directions,
        # e.g. GICP's ~1e-3 tangential weights, must still be solved).
        u_sq = jnp.sum((S[:, None] * V) ** 2, axis=0)
        lam_raw = lam / jnp.maximum(u_sq, 1e-30) / jnp.maximum(w_scale, 1e-12)
        degen = (
            (lam < cfg.degen_rel_thres * lam_max)
            & (lam_raw < cfg.degen_abs_thres)
        ) | (hard_floor_on & (lam_raw < cfg.degen_abs_hard))
        inv = jnp.where(degen, 0.0, 1.0 / (lam + damp))
        delta = -S * ((V * inv[None, :]) @ (V.T @ (S * g)))
        tn = jnp.linalg.norm(delta[:3])
        rn = jnp.linalg.norm(delta[3:])
        scale = jnp.minimum(
            1.0,
            jnp.minimum(
                cfg.max_step_trans / jnp.maximum(tn, 1e-12),
                cfg.max_step_rot / jnp.maximum(rn, 1e-12),
            ),
        )
        delta = delta * scale
        # guard against rank-deficient blowups on degenerate frames
        delta = jnp.where(jnp.all(jnp.isfinite(delta)), delta, jnp.zeros_like(delta))
        return se3.boxplus_left(xi, delta), None

    xi, _ = jax.lax.scan(step, xi, None, length=cfg.inner_iterations)
    return xi


class _OuterState(NamedTuple):
    xi: jax.Array
    weights: _Weights
    mu: jax.Array
    mu_inited: jax.Array  # () bool — mu seeded on the first ALIGNED fine round
    want_coarse: jax.Array  # () bool — next round matches the coarse grid
    prev_planar_cost: jax.Array
    costs: jax.Array  # (4,) last cost sums
    num_corr: jax.Array  # (4,)
    it: jax.Array
    done: jax.Array
    prev_mean_planar: jax.Array  # () mean planar cost of the last KEPT round
    corr_trace: jax.Array  # (max_iter, 4) int32 — per-round family counts
    cost_trace: jax.Array  # (max_iter,) mean planar cost per round
    coarse_trace: jax.Array  # (max_iter,) bool — round used the coarse grid
    aligned_trace: jax.Array  # (max_iter,) bool — round passed alignment
    # best-round tracking (TLSConfig.best_round_tau): the aligned round with
    # the lowest robust score wins the frame
    xi_best: jax.Array = None
    best_score: jax.Array = None
    best_seen: jax.Array = None
    best_it: jax.Array = None  # round index of the current best
    # lazily-built coarse planar grid (zeros until the first coarse round)
    coarse_grid: object = None
    have_coarse: jax.Array = None


def _psum(x, axis_name):
    return x if axis_name is None else jax.lax.psum(x, axis_name)


def _pmax(x, axis_name):
    return x if axis_name is None else jax.lax.pmax(x, axis_name)


def scan_matching(
    scan: FeatureSet,
    submap: FeatureSet,
    predict_pose: jax.Array,
    cfg: TLSConfig,
    axis_name: str | None = None,
    allow_fallback: jax.Array | bool = True,
) -> tuple[jax.Array, Diagnostics]:
    """Register one frame's features against the submap.

    Args:
      scan: the current frame's feature clouds (fixed capacities).
      submap: the local map feature clouds.
      predict_pose: (4,4) motion-model pose prediction (world_T_scan).
      cfg: solver hyper-parameters (static).
      axis_name: when called inside shard_map with the SCAN point buffers
        sharded along their point axis (submap replicated), names the mesh
        axis to psum/pmax the 6x6 normal equations, GNC statistics, and cost
        sums over — the "collective Schur reduction" of the distributed
        solver (see parallel.distributed). None = single-device semantics.

    Returns (pose (4,4), Diagnostics). Matches the contract of the reference
    ``LocalRegistration::scanMatching`` (registration.cpp:879-1133).
    """
    dtype = scan.planar.xyz.dtype
    xi0 = se3.log(predict_pose.astype(dtype))
    # Tiny-rotation degeneracy guard (registration.cpp:884-886). The reference
    # randomizes; we use a fixed tiny axis for determinism — only the
    # magnitude (breaking the exact-zero rotation) matters.
    tiny = jnp.asarray([1.0, 1.0, 1.0], dtype) / jnp.sqrt(3.0) * 1e-4
    omega_small = jnp.linalg.norm(xi0[3:]) < 1e-2
    xi0 = jnp.where(omega_small, xi0.at[3:].set(tiny), xi0)

    if cfg.corr_mode == "cell_plane" and cfg.plane_residual != "gicp":
        # precompute window surface fits once — the submap is constant for
        # the whole solve (the reference rebuilds KD-trees once per call too,
        # registration.cpp:892-915, but re-fits planes EVERY query; our cell
        # cache moves all fitting out of the iteration loop)
        def cells_cap(c: Cloud, divisor: int = 1) -> int:
            # occupied cells can never exceed the point count; the window
            # probe/fetch costs O(max_cells * 8) rows, so don't over-size.
            # Edge (1.0 m cells over sparse lines) and planar (0.5 m cells
            # over feature picks) occupy well under half their point
            # capacity; ground at 0.5 m cells over 0.45 m voxels runs near
            # one cell per point, so it keeps the full capacity.
            return max(1024, min(c.capacity // divisor, 65536))

        grids = {
            "edge": _build_surf_cells(
                submap.edge, cfg.edge_dist_thres, cells_cap(submap.edge, 2),
                line_mode="cell",
            ),
            "sphere": voxel.build_hash_grid(
                submap.sphere.xyz, submap.sphere.valid, cfg.sphere_dist_thres
            ),
            "planar": _build_surf_cells(
                submap.planar, cfg.planar_dist_thres, cells_cap(submap.planar, 2)
            ),
            "ground": _build_surf_cells(
                submap.ground, cfg.ground_dist_thres, cells_cap(submap.ground)
            ),
        }
        if cfg.coarse_scale:
            # the 0.2 plane-precision gate is tuned for fine windows; a
            # coarse window legitimately spans slope/curb/facade variation.
            # Built LAZILY on the first coarse round of a solve (lax.cond
            # in outer_body): healthy frames never go coarse, and paying
            # the 2.4 ms build unconditionally was ~6% of the whole frame
            # (measured r4).
            def build_coarse():
                return _build_surf_cells(
                    submap.planar,
                    cfg.planar_dist_thres * cfg.coarse_scale,
                    cells_cap(submap.planar, 2),
                    precise_thres=0.2 * cfg.coarse_scale,
                )

            grids["planar_coarse"] = jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), jax.eval_shape(build_coarse)
            )
        else:
            build_coarse = None
    else:
        gicp = cfg.plane_residual == "gicp"
        plane_cell = cfg.gicp_dist_thres if gicp else cfg.planar_dist_thres
        ground_cell = cfg.gicp_dist_thres if gicp else cfg.ground_dist_thres
        grids = {
            "edge": voxel.build_hash_grid(
                submap.edge.xyz, submap.edge.valid, cfg.edge_dist_thres
            ),
            "sphere": voxel.build_hash_grid(
                submap.sphere.xyz, submap.sphere.valid, cfg.sphere_dist_thres
            ),
            "planar": voxel.build_hash_grid(
                submap.planar.xyz, submap.planar.valid, plane_cell
            ),
            "ground": voxel.build_hash_grid(
                submap.ground.xyz, submap.ground.valid, ground_cell
            ),
        }
        if gicp and cfg.coarse_scale:
            # coarse re-localization for GICP (VERDICT r4 next #4): the
            # basin-escape machinery (coarse cell-plane rounds + yaw fan) is
            # residual-family agnostic — coarse rounds match point-to-plane
            # against a coarse_scale cell grid regardless of what the fine
            # rounds solve. The reference's GICP variant has no coarse
            # machinery either (registration.cpp:649-702,792-845), but ours
            # exists and not engaging it left gicp unable to survive a
            # 1 m/frame cold start (MODES_r04 gicp ATE 12.5 m).
            def build_coarse():
                return _build_surf_cells(
                    submap.planar,
                    cfg.planar_dist_thres * cfg.coarse_scale,
                    max(1024, min(submap.planar.capacity // 2, 65536)),
                    precise_thres=0.2 * cfg.coarse_scale,
                )

            grids["planar_coarse"] = jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), jax.eval_shape(build_coarse)
            )
        else:
            build_coarse = None

    has_coarse = "planar_coarse" in grids

    # GNC eps in the residual family's own scale (see
    # TLSConfig.gicp_noise_bound for why the metric bound cannot be shared)
    if cfg.plane_residual == "gicp":
        noise_bound_sq = cfg.gicp_noise_bound**2
    else:
        noise_bound_sq = cfg.noise_bound**2
    if noise_bound_sq < 1e-16:
        noise_bound_sq = 1e-2  # registration.cpp:962-964

    if cfg.plane_residual == "gicp":
        gicp_covs = {
            "scan_planar": calculate_covariances(
                scan.planar, cfg.k_corr, max_per_cell=cfg.max_per_cell
            ),
            "scan_ground": calculate_covariances(
                scan.ground, cfg.k_corr, max_per_cell=cfg.max_per_cell
            ),
            "submap_planar": calculate_covariances(
                submap.planar, cfg.k_corr, max_per_cell=cfg.max_per_cell
            ),
            "submap_ground": calculate_covariances(
                submap.ground, cfg.k_corr, max_per_cell=cfg.max_per_cell
            ),
        }
    else:
        gicp_covs = None

    w0 = _Weights(
        jnp.ones(scan.planar.capacity, dtype),
        jnp.ones(scan.ground.capacity, dtype),
        jnp.ones(scan.edge.capacity, dtype),
        jnp.ones(scan.sphere.capacity, dtype),
    )

    # alignment gating only applies where the planar cost has its
    # point-to-plane metric meaning (m^2); gicp costs live on a
    # covariance-normalized scale
    gate_on_alignment = cfg.plane_residual == "point_to_plane"
    # planar candidate count for the match-fraction trigger (see
    # TLSConfig.relocal_frac). Clamped at the family cap: with the cap
    # binding, ncorr can never exceed planar_maxnum, so an uncapped
    # denominator would make frac_ok unattainable and the alignment gate
    # permanently false.
    n_planar_cand = jnp.minimum(
        _psum(jnp.sum(scan.planar.valid), axis_name), cfg.planar_maxnum
    )

    def outer_body(st: _OuterState) -> _OuterState:
        # A round is a COARSE round when the PREVIOUS fine round ended
        # grossly misaligned (mean planar cost above coarse_cost_thres) or
        # lost the planar family outright. That happens exactly where the
        # constant-velocity prediction is structurally behind — startup
        # (predict = identity, a full step of error), sharp-turn onset
        # (0.06 rad/frame of yaw lag pushes every point past ~12 m beyond
        # the fine 3x3x3 window reach of ~1.5 cells), post-occlusion loss —
        # and never on healthy frames, whose trajectory stays untouched.
        # Coarse rounds never touch the GNC weights / mu (see below): they
        # only widen the basin; the following fine round does the precision.
        if has_coarse:
            use_coarse = st.want_coarse
        else:
            use_coarse = jnp.asarray(False)
        # lazy coarse-grid build: constructed on the FIRST coarse round of
        # this solve, then carried in the outer state (healthy frames never
        # pay the ~2.4 ms build — measured r4)
        if has_coarse and build_coarse is not None:
            coarse_grid, have_coarse = jax.lax.cond(
                use_coarse & ~st.have_coarse,
                lambda: (build_coarse(), jnp.asarray(True)),
                lambda: (st.coarse_grid, st.have_coarse),
            )
            round_grids = {**grids, "planar_coarse": coarse_grid}
        else:
            coarse_grid, have_coarse = st.coarse_grid, st.have_coarse
            round_grids = grids
        # yaw-hypothesis fan: a coarse (lost) round first snaps xi to the
        # best of a small yaw bank (see _yaw_fan). lax.cond keeps the fan
        # off the healthy-frame execution path entirely.
        if has_coarse and cfg.yaw_fan_half > 0:
            xi_in = jax.lax.cond(
                use_coarse,
                lambda x: _yaw_fan(
                    x, scan, round_grids["planar_coarse"], cfg, axis_name
                ),
                lambda x: x,
                st.xi,
            )
        else:
            xi_in = st.xi
        corr = _build_correspondences(
            xi_in, scan, submap, round_grids, cfg, gicp_covs, axis_name, use_coarse
        )

        # mean squared GNC weight over valid correspondences: re-normalizes
        # the absolute degeneracy thresholds inside _gn_inner (GN is
        # invariant to a uniform weight scale; the curvature gate is not)
        w_mass = (
            jnp.sum(jnp.square(st.weights.planar) * corr.plane_valid)
            + jnp.sum(jnp.square(st.weights.ground) * corr.ground_valid)
            + jnp.sum(jnp.square(st.weights.edge) * corr.edge_valid)
            + jnp.sum(jnp.square(st.weights.sphere) * corr.sphere_valid)
        )
        n_valid = (
            jnp.sum(corr.plane_valid) + jnp.sum(corr.ground_valid)
            + jnp.sum(corr.edge_valid) + jnp.sum(corr.sphere_valid)
        )
        w_scale = _psum(w_mass, axis_name) / jnp.maximum(
            _psum(n_valid, axis_name), 1
        )

        planar_empty = (
            _psum(jnp.sum(corr.plane_valid), axis_name) == 0
        )
        xi = _gn_inner(
            xi_in, scan, corr, st.weights, cfg, axis_name,
            hard_floor_on=planar_empty, w_scale=w_scale,
        )

        # final-pose costs feed the GNC weight update (the reference's cost
        # side-channels hold the values of Ceres' last Evaluate call)
        _, _, costs = _evaluate(
            xi, scan, corr, st.weights,
            cfg.gicp_noise_bound if cfg.plane_residual == "gicp" else 1.0,
        )

        planar_cost = _psum(jnp.sum(costs.planar), axis_name)
        ncorr = _psum(
            jnp.stack(
                [
                    jnp.sum(corr.plane_valid),
                    jnp.sum(corr.ground_valid),
                    jnp.sum(corr.edge_valid),
                    jnp.sum(corr.sphere_valid),
                ]
            ),
            axis_name,
        ).astype(jnp.int32)
        mean_planar = planar_cost / jnp.maximum(ncorr[0], 1)

        # Monotonicity guard on WEIGHTED rounds (outer-round trust region).
        # The first weighted round after mu seeding can explode: with mu
        # seeded tiny (one large max residual — the edge family's
        # (sum components)^2 quirk produces 0.1+ costs), th2 collapses and
        # the transition-band weight sqrt(eps^2 mu (mu+1)/r) spreads as
        # 1/sqrt(r) over ~200x, so a handful of lucky near-zero-residual
        # points dominate the normal equations and the solve slides ~1 m
        # along the weakest geometric direction (measured at turn apexes:
        # mean planar cost 1.7e-4 -> 0.89 in one round). When a weighted
        # fine round multiplies the mean planar cost by >4 (and above the
        # alignment gate), REVERT its xi and reset the weights to 1; mu has
        # already ramped e^gnc_factor, which lifts th2 ~1e5x and collapses
        # the weight spread, so the re-engaged update next round is sane.
        # The reference never needed this: Ceres' SUBSPACE_DOGLEG trust
        # region bounds the damage of the same weight spread
        # (registration.cpp:1040).
        revert = (
            st.mu_inited
            & ~use_coarse
            & (mean_planar > jnp.maximum(4.0 * st.prev_mean_planar,
                                         cfg.coarse_cost_thres))
            & (ncorr[0] > 0)
        )
        # Starved-round revert (TLSConfig.revert_starved_rounds): a FINE
        # round that matched under fallback_frac of the planar candidates
        # solved on an aliased sliver and must not commit its delta — the
        # following coarse round / yaw fan would otherwise restart from the
        # polluted estimate instead of the motion model. Measured (SWEEP_r04
        # route-a world 205, f19): post-occlusion recovery round 0 matched
        # 41/900 yet moved xi into a +7 deg basin; the fan (reach ±6 deg,
        # scored about the moved xi) then locked the wrong basin and the
        # drive never re-aligned — 7.9 deg of permanent rotation error.
        # ROUND 0 ONLY: the motion-model input is the one trustworthy
        # restart point. Later fine rounds follow coarse/yaw-fan rounds
        # whose output already won a robust truncated-cost vote — reverting
        # those discards the solver's only measurement exactly where matches
        # are structurally sparse (measured, route-a world 407: a chronic
        # low-frac world's right turn matched 5-10%; full-depth reverts
        # dead-reckoned through it at 20 deg of permanent heading error).
        if gate_on_alignment and cfg.revert_starved_rounds:
            revert_starved = (
                ~use_coarse
                & (st.it == 0)
                & (ncorr[0] < cfg.fallback_frac * n_planar_cand)
            )
        else:
            revert_starved = jnp.asarray(False)

        # Alignment test on this round's converged solution: GNC (mu seeding
        # + weight updates) only engages once the scan is roughly aligned.
        # While grossly misaligned, TLS residuals measure pose error, not
        # outlier-ness — seeding mu there collapses every weight ~100x on
        # exactly the frames (turn onset, startup) that most need their
        # correspondences, and a weight update with the initial mu=1 kills
        # anything above ~1.4cm outright (both measured on the 120-frame
        # varied drive).
        if gate_on_alignment:
            frac_ok = ncorr[0] >= cfg.relocal_frac * n_planar_cand
            aligned = (
                (mean_planar <= cfg.coarse_cost_thres) & frac_ok
                & (ncorr[0] > 0) & ~use_coarse & ~revert
            )
            # GNC may engage BELOW the alignment frac (TLSConfig.gnc_frac):
            # low residuals + a material match fraction mean the residuals
            # measure fit, not pose error — worlds whose attainable match
            # fraction never reaches relocal_frac must still get outlier
            # weighting (see config rationale).
            gnc_ok = (
                (mean_planar <= cfg.coarse_cost_thres)
                & (ncorr[0] >= cfg.gnc_frac * n_planar_cand)
                & (ncorr[0] > 0) & ~use_coarse & ~revert & ~revert_starved
            )
        else:
            # gicp alignment gate (TLSConfig.gicp_align_dist): metric mean
            # matched NN distance at the round's INPUT pose — the
            # point-to-plane cost gate's scale-free equivalent. Gates both
            # GNC engagement (truncating 1 m-offset residuals kills the
            # cold-start correction signal) and, via ~aligned, the coarse/
            # yaw-fan trigger.
            pw_in = se3.transform(se3.exp(xi_in), scan.planar.xyz)
            nn_d = jnp.linalg.norm(pw_in - corr.plane_n, axis=-1)
            mean_nn = _psum(
                jnp.sum(jnp.where(corr.plane_valid, nn_d, 0.0)), axis_name
            ) / jnp.maximum(ncorr[0], 1)
            gicp_aligned = mean_nn <= cfg.gicp_align_dist
            aligned = (ncorr[0] > 0) & gicp_aligned & ~use_coarse & ~revert
            gnc_ok = aligned

        # mu initialisation on the first GNC-eligible fine round (reference:
        # registration.cpp:1027-1033, executed before the first solve).
        first_fine = ~st.mu_inited & gnc_ok
        if cfg.mu_init == "reference_zero":
            # The reference reads still-zeroed residual buffers => mu = 1e-10.
            mu = jnp.where(first_fine, jnp.asarray(1e-10, dtype), st.mu)
        else:
            # GNC-TLS proper: mu from the max residual of the CONVERGED
            # aligned solution (already in `costs` — no extra _evaluate).
            max_r = jnp.maximum(
                jnp.max(costs.planar),
                jnp.maximum(jnp.max(costs.edge), jnp.max(costs.sphere)),
            )
            max_r = _pmax(max_r, axis_name)
            mu = jnp.where(
                first_fine,
                res.gnc_init_mu(max_r, noise_bound_sq, inlier_mu=1e6),
                st.mu,
            )
        mu_inited = st.mu_inited | first_fine

        th1, th2 = res.gnc_thresholds(mu, noise_bound_sq)
        new_w = _Weights(
            res.gnc_update_weights(
                st.weights.planar, costs.planar, noise_bound_sq, th1, th2, mu
            ),
            res.gnc_update_weights(
                st.weights.ground, costs.ground, noise_bound_sq, th1, th2, mu
            ),
            res.gnc_update_weights(
                st.weights.edge, costs.edge, noise_bound_sq, th1, th2, mu
            ),
            res.gnc_update_weights(
                st.weights.sphere, costs.sphere, noise_bound_sq, th1, th2, mu
            ),
        )
        # weights/mu advance only on aligned fine rounds with mu seeded.
        # On a REVERTED round the exploded costs must not drive the update
        # (they would zero every weight); reset the weights to 1 instead —
        # the next round re-solves unweighted from the reverted (good) xi,
        # and its update re-engages with the ramped (softer) mu.
        do_update = mu_inited & ~use_coarse & ~revert_starved
        new_w = jax.tree.map(
            lambda old, new: jnp.where(do_update, new, old), st.weights, new_w
        )
        new_w = jax.tree.map(
            lambda w_: jnp.where(revert, jnp.ones_like(w_), w_), new_w
        )
        mu = jnp.where(
            do_update,
            res.gnc_next_mu(mu, st.it.astype(dtype), cfg.gnc_factor),
            mu,
        )
        planar_cost_out = jnp.where(
            use_coarse, jnp.asarray(jnp.inf, dtype), planar_cost
        )
        # next round goes coarse when this fine round is still misaligned or
        # starved — never twice in a row (a coarse round's residuals against
        # coarse planes are legitimately large; alignment is re-measured on
        # the fine round that follows)
        if has_coarse:
            lost = ~aligned | (ncorr[0] < cfg.relocal_corr_thres)
            if not gate_on_alignment:
                # gicp has no metric alignment gate (its costs live on the
                # covariance-normalized scale), but the matched FRACTION is
                # scale-free: a fine round that matched under relocal_frac
                # of the planar candidates is lost (cold start, occlusion
                # flip) and the next round goes coarse.
                lost = lost | (
                    ncorr[0] < cfg.relocal_frac * n_planar_cand
                )
            want_coarse = (
                lost
                & ~use_coarse
                & ~revert  # reverted to a good xi: next fine round refines
            )
        else:
            want_coarse = st.want_coarse
        cost_sums = jnp.stack(
            [
                planar_cost,
                _psum(jnp.sum(costs.ground), axis_name),
                _psum(jnp.sum(costs.edge), axis_name),
                _psum(jnp.sum(costs.sphere), axis_name),
            ]
        )
        # planar-only convergence gate (registration.cpp:1108-1111) — with a
        # fail-safe the reference never needed: an EMPTY planar family has
        # cost identically 0, so the raw |delta| gate would declare
        # convergence on exactly the frames that still need every iteration
        # to re-localize (post-occlusion loss: measured 3 m/frame divergence
        # on the 120-frame drive).
        done = (
            (jnp.abs(planar_cost - st.prev_planar_cost) < cfg.cost_threshold)
            & (ncorr[0] > 0)
            & ~use_coarse
            & ~want_coarse
            & ~revert
            & ~revert_starved
        )
        if cfg.exit_cost_thres:
            # alignment-based early exit (TLSConfig.exit_cost_thres): the
            # f32 cost-delta gate above essentially never fires; this is
            # what makes a high max_iterations ceiling free on healthy
            # frames while still-converging frames spend all of it
            # gate on st.mu_inited (seeded on a PREVIOUS round): the round
            # that first seeds mu solved unweighted — at least one weighted
            # outlier pass must run before the exit can fire
            done = done | (
                aligned
                & st.mu_inited
                & (mean_planar < cfg.exit_cost_thres)
                & (st.it >= 2)
            )
        xi = jnp.where(revert | revert_starved, st.xi, xi)
        prev_mean = jnp.where(
            use_coarse | revert | revert_starved,
            st.prev_mean_planar, mean_planar,
        )
        # best-round tracking (TLSConfig.best_round_tau): robust score =
        # planar cost + tau^2 per unmatched candidate, per candidate. The
        # unmatched penalty is what separates a half-cell translation alias
        # (marginally lower cost, fewer matches) from the true pose.
        # best-round selection and the stall exit are gated on point_to_plane
        # (mirroring gate_on_alignment): in gicp mode costs.planar embeds GNC
        # weights on the covariance-normalized scale, so the cross-round
        # score comparison is dominated by monotone weight shrinkage and
        # tau^2=0.01 is negligible against inlier costs ~25 — the mechanism
        # silently degrades to last-round-wins (advisor r4 finding).
        if cfg.best_round_tau and gate_on_alignment:
            tau_sq = jnp.asarray(cfg.best_round_tau**2, dtype)
            n_cand = jnp.maximum(n_planar_cand, 1).astype(dtype)
            score = (
                planar_cost + (n_cand - ncorr[0].astype(dtype)) * tau_sq
            ) / n_cand
            better = aligned & (score < st.best_score)
            xi_best = jnp.where(better, xi, st.xi_best)
            best_score = jnp.where(better, score, st.best_score)
            best_seen = st.best_seen | better
            best_it = jnp.where(better, st.it, st.best_it)
            if cfg.exit_stall_rounds:
                # stall exit (TLSConfig.exit_stall_rounds): the best robust
                # score stopped improving — further rounds only wander
                done = done | (
                    best_seen & (st.it - best_it >= cfg.exit_stall_rounds)
                )
        else:
            xi_best, best_score, best_seen, best_it = (
                st.xi_best, st.best_score, st.best_seen, st.best_it
            )
        return _OuterState(
            xi, new_w, mu, mu_inited, want_coarse, planar_cost_out, cost_sums,
            ncorr, st.it + 1, done, prev_mean,
            st.corr_trace.at[st.it].set(ncorr),
            st.cost_trace.at[st.it].set(mean_planar),
            st.coarse_trace.at[st.it].set(use_coarse),
            st.aligned_trace.at[st.it].set(aligned),
            xi_best, best_score, best_seen, best_it,
            coarse_grid, have_coarse,
        )

    init = _OuterState(
        xi=xi0,
        weights=w0,
        mu=jnp.asarray(1.0, dtype),
        mu_inited=jnp.asarray(False),
        want_coarse=jnp.asarray(False),  # round 0 is always fine
        prev_planar_cost=jnp.asarray(jnp.inf, dtype),
        costs=jnp.zeros(4, dtype),
        num_corr=jnp.full((4,), 1 << 20, jnp.int32),
        it=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
        prev_mean_planar=jnp.asarray(jnp.inf, dtype),
        corr_trace=jnp.zeros((cfg.max_iterations, 4), jnp.int32),
        cost_trace=jnp.zeros(cfg.max_iterations, dtype),
        coarse_trace=jnp.zeros(cfg.max_iterations, bool),
        aligned_trace=jnp.zeros(cfg.max_iterations, bool),
        xi_best=xi0,
        best_score=jnp.asarray(jnp.inf, dtype),
        best_seen=jnp.asarray(False),
        best_it=jnp.asarray(0, jnp.int32),
        coarse_grid=grids.get("planar_coarse"),
        have_coarse=jnp.asarray(False),
    )

    # Fixed-trip loop with done-masking instead of while_loop: the early-exit
    # condition still freezes the state (same semantics as the reference's
    # break, registration.cpp:1108-1111), but a data-dependent while forces
    # XLA to serialize the loop on the scalar core (see models/dcvc.py note).
    final = jax.lax.fori_loop(
        0,
        cfg.max_iterations,
        lambda _, st: jax.lax.cond(st.done, lambda s: s, outer_body, st),
        init,
    )

    # return the BEST aligned round's xi, not the last round's (see
    # TLSConfig.best_round_tau; falls back to the final xi when no round
    # ever aligned — the misaligned-containment path below handles that)
    if cfg.best_round_tau and gate_on_alignment:
        xi_final = jnp.where(final.best_seen, final.xi_best, final.xi)
    else:
        xi_final = final.xi
    pose = se3.exp(xi_final)
    # degenerate-frame containment: with too few correspondences the normal
    # equations are ill-posed — keep the motion-model prediction.
    degenerate = jnp.sum(final.num_corr) < cfg.min_total_corr
    # misaligned-frame containment: if NO round ever passed the alignment
    # gate, the solve converged onto a self-consistent nearby subset while
    # the bulk of the scan stayed unmatched — the classic total-occlusion
    # flip (a gateway/tunnel exit changes the whole view in one frame;
    # measured on the varied drive: solved pose 0.81 m off where the
    # constant-velocity prediction was 0.16 m off). Trust the motion model
    # for this frame; matching re-engages against it next frame.
    if gate_on_alignment and cfg.misaligned_fallback:
        # The trigger is STARVATION only: a never-aligned solve whose final
        # round matched under fallback_frac of the planar candidates (the
        # unmatched bulk carries the error). Two rejected alternatives,
        # both measured on the 60/120-frame drives:
        #   * the cost gate alone misfires at low scan density (cell-window
        #     planes over 24-ring scans floor the mean planar cost at ~5e-3
        #     with the pose perfectly healthy);
        #   * a deviation-from-prediction ("implausibility") clause vetoes
        #     the LEGITIMATE large corrections of turn onset — the
        #     prediction is structurally behind through a turn, each veto
        #     makes the next round's correction larger, and the cascade
        #     dead-reckons straight through the whole turn (1.2 m/frame).
        # `allow_fallback` lets the caller veto dead reckoning where the
        # motion model itself is untrustworthy (startup, long streaks).
        starved = final.num_corr[0] < cfg.fallback_frac * n_planar_cand
        never_aligned = ~jnp.any(final.aligned_trace)
        misaligned = never_aligned & starved & jnp.asarray(allow_fallback)
    else:
        misaligned = jnp.asarray(False)
        never_aligned = jnp.asarray(False)
    pose_override = misaligned if cfg.misaligned_pose_fallback else jnp.asarray(False)
    pose = jnp.where(degenerate | pose_override, predict_pose.astype(dtype), pose)
    return pose, Diagnostics(
        final.it, final.mu, final.costs, final.num_corr, degenerate,
        misaligned=misaligned, never_aligned=never_aligned,
        corr_trace=final.corr_trace, cost_trace=final.cost_trace,
        coarse_trace=final.coarse_trace, aligned_trace=final.aligned_trace,
    )


def fitness_score(
    scan: FeatureSet, submap: FeatureSet, cfg: TLSConfig
) -> tuple[jax.Array, jax.Array]:
    """Total fitness + summed inlier RMSE across the four families
    (reference getFitnessScore, registration.cpp:257-296: per family,
    fraction of scan points with a submap neighbor within fitness_thres and
    sqrt of mean squared neighbor distance; family scores are summed)."""
    total_fit = jnp.asarray(0.0, scan.planar.xyz.dtype)
    total_rmse = jnp.asarray(0.0, scan.planar.xyz.dtype)
    for s, m in [
        (scan.edge, submap.edge),
        (scan.sphere, submap.sphere),
        (scan.planar, submap.planar),
        (scan.ground, submap.ground),
    ]:
        grid = voxel.build_hash_grid(m.xyz, m.valid, cfg.fitness_thres)
        _, dist_sq, ok = voxel.query_knn(
            grid, s.xyz, s.valid, k=1, radius=cfg.fitness_thres,
            max_per_cell=cfg.max_per_cell,
        )
        n = jnp.sum(ok[:, 0])
        err = jnp.sum(jnp.where(ok[:, 0], dist_sq[:, 0], 0.0))
        denom = jnp.maximum(s.count(), 1)
        fit = jnp.where(n > 0, n / denom, 0.0)
        rmse = jnp.where(n > 0, jnp.sqrt(err / jnp.maximum(n, 1)), 0.0)
        total_fit = total_fit + fit
        total_rmse = total_rmse + rmse
    return total_fit, total_rmse
