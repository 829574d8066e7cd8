"""Closed-form batched symmetric 3x3 eigendecomposition.

TPU-native replacement for the per-point `Eigen::SelfAdjointEigenSolver` /
`JacobiSVD` calls the reference scatters through its hot loops (reference:
registration.cpp:476-479 edge-line fits, feature_extract.cpp:47-122 PCA,
registration.cpp:407-411 GICP covariance regularization). Instead of an
iterative solver per point on CPU threads, the trigonometric closed form
(Smith 1961) evaluates every covariance in one fused batch of VPU ops —
no data-dependent control flow, so it vmaps/jits cleanly and XLA can fuse it
into the surrounding kernel.

All functions broadcast over leading batch dims. Eigenvalues are returned in
ASCENDING order (matching Eigen's SelfAdjointEigenSolver convention the
reference relies on: eigenvalues()[2] is the largest).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def eigvalsh3_soa(a00, a01, a02, a11, a12, a22):
    """Eigenvalues from the six unique symmetric-matrix components (SoA
    layout — no (...,3,3) tensor materialized; see ops/voxel.py on TPU
    tiling). Returns (e_lo, e_mid, e_hi) as separate arrays."""
    q = (a00 + a11 + a22) / 3.0
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))

    safe_p = jnp.where(p > 0.0, p, jnp.ones_like(p))
    # det(B)/2 with B = (A - qI)/p
    detB = (
        b00 * (b11 * b22 - a12 * a12)
        - a01 * (a01 * b22 - a12 * a02)
        + a02 * (a01 * a12 - b11 * a02)
    )
    r = jnp.clip(detB / (2.0 * safe_p * safe_p * safe_p), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    e_hi = q + 2.0 * p * jnp.cos(phi)
    e_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_hi - e_lo

    isotropic = p2 <= 1e-30
    e_hi = jnp.where(isotropic, q, e_hi)
    e_mid = jnp.where(isotropic, q, e_mid)
    e_lo = jnp.where(isotropic, q, e_lo)
    return e_lo, e_mid, e_hi


def eigvalsh3(A: jax.Array) -> jax.Array:
    """Eigenvalues of symmetric (...,3,3), ascending: (...,3)."""
    e_lo, e_mid, e_hi = eigvalsh3_soa(
        A[..., 0, 0], A[..., 0, 1], A[..., 0, 2],
        A[..., 1, 1], A[..., 1, 2], A[..., 2, 2],
    )
    return jnp.stack([e_lo, e_mid, e_hi], axis=-1)


def eigvec_soa(a00, a01, a02, a11, a12, a22, lam):
    """Unit eigenvector for eigenvalue `lam`, as three scalar arrays
    (nx, ny, nz). Same largest-row-cross-product construction as
    `_eigvec_for`, fully in scalar components."""
    b00, b11, b22 = a00 - lam, a11 - lam, a22 - lam
    # rows of B = A - lam I: r0=(b00,a01,a02) r1=(a01,b11,a12) r2=(a02,a12,b22)
    # cross(r0, r1), cross(r0, r2), cross(r1, r2)
    c01x = a01 * a12 - a02 * b11
    c01y = a02 * a01 - b00 * a12
    c01z = b00 * b11 - a01 * a01
    c02x = a01 * b22 - a02 * a12
    c02y = a02 * a02 - b00 * b22
    c02z = b00 * a12 - a01 * a02
    c12x = b11 * b22 - a12 * a12
    c12y = a12 * a02 - a01 * b22
    c12z = a01 * a12 - b11 * a02
    n01 = c01x * c01x + c01y * c01y + c01z * c01z
    n02 = c02x * c02x + c02y * c02y + c02z * c02z
    n12 = c12x * c12x + c12y * c12y + c12z * c12z
    use01 = (n01 >= n02) & (n01 >= n12)
    use02 = ~use01 & (n02 >= n12)
    vx = jnp.where(use01, c01x, jnp.where(use02, c02x, c12x))
    vy = jnp.where(use01, c01y, jnp.where(use02, c02y, c12y))
    vz = jnp.where(use01, c01z, jnp.where(use02, c02z, c12z))
    norm = jnp.sqrt(vx * vx + vy * vy + vz * vz)
    ok = norm > 1e-20
    inv = jnp.where(ok, 1.0 / jnp.maximum(norm, 1e-30), 0.0)
    return (
        jnp.where(ok, vx * inv, 1.0),
        jnp.where(ok, vy * inv, 0.0),
        jnp.where(ok, vz * inv, 0.0),
    )


def _eigvec_for(A: jax.Array, lam: jax.Array) -> jax.Array:
    """Eigenvector for eigenvalue lam: the largest cross product of two rows
    of (A - lam I) is orthogonal to both rows => spans the null space."""
    B = A - lam[..., None, None] * jnp.eye(3, dtype=A.dtype)
    r0, r1, r2 = B[..., 0, :], B[..., 1, :], B[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    best = jnp.where(
        (n01 >= n02)[..., None] & (n01 >= n12)[..., None],
        c01,
        jnp.where((n02 >= n12)[..., None], c02, c12),
    )
    norm = jnp.linalg.norm(best, axis=-1, keepdims=True)
    # Degenerate (repeated eigenvalue / isotropic): fall back to e_x; the
    # caller-facing orthonormalization in eigh3 repairs the frame.
    fallback = jnp.zeros_like(best).at[..., 0].set(1.0)
    return jnp.where(norm > 1e-20, best / jnp.maximum(norm, 1e-30), fallback)


def eigh3(A: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Full symmetric 3x3 eigendecomposition.

    Returns (eigvals (...,3) ascending, eigvecs (...,3,3)) with eigvecs[..., :, i]
    the unit eigenvector of eigvals[..., i] — same layout as jnp.linalg.eigh.
    """
    w = eigvalsh3(A)
    v_lo = _eigvec_for(A, w[..., 0])
    v_hi = _eigvec_for(A, w[..., 2])
    # Repair near-degenerate cases: make v_hi orthogonal to v_lo, then the
    # middle vector closes the right-handed frame exactly.
    v_hi = v_hi - jnp.sum(v_hi * v_lo, axis=-1, keepdims=True) * v_lo
    norm_hi = jnp.linalg.norm(v_hi, axis=-1, keepdims=True)
    # if v_hi collapsed onto v_lo (isotropic matrix), pick any orthogonal dir
    alt = jnp.cross(v_lo, jnp.zeros_like(v_lo).at[..., 2].set(1.0))
    alt_norm = jnp.linalg.norm(alt, axis=-1, keepdims=True)
    alt2 = jnp.cross(v_lo, jnp.zeros_like(v_lo).at[..., 1].set(1.0))
    alt = jnp.where(alt_norm > 1e-6, alt, alt2)
    alt = alt / jnp.maximum(jnp.linalg.norm(alt, axis=-1, keepdims=True), 1e-30)
    v_hi = jnp.where(norm_hi > 1e-10, v_hi / jnp.maximum(norm_hi, 1e-30), alt)
    v_mid = jnp.cross(v_hi, v_lo)
    V = jnp.stack([v_lo, v_mid, v_hi], axis=-1)
    return w, V


def plane_from_points(
    pts: jax.Array, mask: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Masked least-squares plane fit through a neighborhood.

    pts: (..., K, 3); mask: (..., K) — invalid points are ignored.
    Returns (unit_normal (...,3), d (...), curvature_ratio lam0/sum (...)).
    Plane satisfies n·x + d = 0 through the masked centroid; the normal is the
    eigenvector of the smallest covariance eigenvalue (same geometry as the
    reference's weighted cross-product `fitBestPlane`, registration.cpp:303-368,
    but via the covariance eigenproblem which is branch-free and batched).
    """
    m = mask.astype(pts.dtype)
    cnt = jnp.maximum(jnp.sum(m, axis=-1), 1.0)
    mean = jnp.sum(pts * m[..., None], axis=-2) / cnt[..., None]
    diff = (pts - mean[..., None, :]) * m[..., None]
    cov = jnp.einsum("...ki,...kj->...ij", diff, diff) / cnt[..., None, None]
    w, V = eigh3(cov)
    n = V[..., :, 0]
    d = -jnp.sum(n * mean, axis=-1)
    lam_sum = jnp.maximum(jnp.sum(w, axis=-1), 1e-30)
    return n, d, w[..., 0] / lam_sum


def line_from_points(
    pts: jax.Array, mask: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Masked line fit: returns (centroid (...,3), unit_direction (...,3),
    linearity gate lam2 > 3*lam1 as float mask (...)).

    Mirrors the reference edge-line fit (registration.cpp:451-484): direction
    is the largest-eigenvalue eigenvector of the neighborhood covariance and
    the correspondence is accepted when lam_max > 3 * lam_mid.
    """
    m = mask.astype(pts.dtype)
    cnt = jnp.maximum(jnp.sum(m, axis=-1), 1.0)
    mean = jnp.sum(pts * m[..., None], axis=-2) / cnt[..., None]
    diff = (pts - mean[..., None, :]) * m[..., None]
    cov = jnp.einsum("...ki,...kj->...ij", diff, diff) / cnt[..., None, None]
    w, V = eigh3(cov)
    direction = V[..., :, 2]
    is_line = (w[..., 2] > 3.0 * w[..., 1]).astype(pts.dtype)
    return mean, direction, is_line
