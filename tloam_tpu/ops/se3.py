"""Batched SE(3)/SO(3) Lie-group math for JAX.

TPU-native replacement for the reference's vendored Sophus headers
(reference: include/third_party/sophus/se3.hpp, so3.hpp). Everything here is
pure-functional, shape-polymorphic over leading batch dimensions, and safe
under jit/vmap/grad (small-angle branches use Taylor series selected with
jnp.where on *safe* operands, so gradients are finite at theta = 0).

Conventions (matching the reference solver):
  * A tangent vector ``xi`` is a 6-vector ``[upsilon (3), omega (3)]`` —
    translational part first, Sophus ordering (se3.hpp `SE3::exp`).
  * ``exp(xi)`` returns a homogeneous (…,4,4) transform.
  * Pose updates in the solver are LEFT-multiplicative:
    ``xi ⊞ delta = log(exp(delta) @ exp(xi))``
    (reference: registration.cpp:162-173 PoseSE3Parameterization::Plus).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jax.Array) -> jax.Array:
    """so(3) hat operator: (...,3) -> (...,3,3) skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jax.Array) -> jax.Array:
    """Inverse of hat: (...,3,3) -> (...,3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc_coeffs(theta_sq: jax.Array):
    """Return (A, B, C) = (sin t/t, (1-cos t)/t^2, (t - sin t)/t^3).

    Taylor-expanded near zero so values and gradients are finite.
    """
    small = theta_sq < _EPS
    # Safe theta for the trig branch (avoid 0-division under grad).
    safe_sq = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)
    theta = jnp.sqrt(safe_sq)
    A_t = jnp.sin(theta) / theta
    B_t = (1.0 - jnp.cos(theta)) / safe_sq
    C_t = (theta - jnp.sin(theta)) / (safe_sq * theta)
    # Taylor: A ≈ 1 - t²/6, B ≈ 1/2 - t²/24, C ≈ 1/6 - t²/120
    A_s = 1.0 - theta_sq / 6.0
    B_s = 0.5 - theta_sq / 24.0
    C_s = 1.0 / 6.0 - theta_sq / 120.0
    A = jnp.where(small, A_s, A_t)
    B = jnp.where(small, B_s, B_t)
    C = jnp.where(small, C_s, C_t)
    return A, B, C


def exp_so3(w: jax.Array) -> jax.Array:
    """SO(3) exponential (Rodrigues): (...,3) -> (...,3,3)."""
    theta_sq = jnp.sum(w * w, axis=-1)
    A, B, _ = _sinc_coeffs(theta_sq)
    W = hat(w)
    WW = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A[..., None, None] * W + B[..., None, None] * WW


def left_jacobian_so3(w: jax.Array) -> jax.Array:
    """Left Jacobian V of SO(3): V = I + B·W + C·W² (the SE(3) 'V' matrix)."""
    theta_sq = jnp.sum(w * w, axis=-1)
    _, B, C = _sinc_coeffs(theta_sq)
    W = hat(w)
    WW = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + B[..., None, None] * W + C[..., None, None] * WW


def log_so3(R: jax.Array) -> jax.Array:
    """SO(3) logarithm: (...,3,3) -> (...,3).

    Uses the trace formula with a quaternion-free fallback that stays accurate
    up to theta < pi (sufficient for incremental odometry poses).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    theta_sq = theta * theta

    small = theta_sq < _EPS
    near_pi = theta > (jnp.pi - 1e-3)

    w_asym = vee(R - jnp.swapaxes(R, -1, -2)) * 0.5  # = sin(theta) * axis

    safe_theta = jnp.where(small | near_pi, jnp.ones_like(theta), theta)
    sin_t = jnp.sin(safe_theta)
    # generic: w = theta / (2 sin theta) * vee(R - Rᵀ)
    w_generic = (safe_theta / sin_t)[..., None] * w_asym
    # small: w ≈ (1 + theta²/6) * vee(R-Rᵀ)/2
    w_small = (1.0 + theta_sq / 6.0)[..., None] * w_asym

    # near pi: axis from diagonal of (R + I)/2 = axis axisᵀ approx
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis_sq = jnp.clip((diag - cos_t[..., None]) / (1.0 - cos_t[..., None] + 1e-12), 0.0, None)
    axis_abs = jnp.sqrt(axis_sq)
    # pick signs from the off-diagonal sums (R + Rᵀ terms), anchored on the
    # largest component to fix the global sign ambiguity
    off = jnp.stack(
        [
            R[..., 2, 1] + R[..., 1, 2],  # ~ 2*ay*az... used pairwise below
            R[..., 0, 2] + R[..., 2, 0],
            R[..., 1, 0] + R[..., 0, 1],
        ],
        axis=-1,
    )
    k = jnp.argmax(axis_abs, axis=-1)
    # sign of component j relative to the anchor k: sign(M[j,k]) where
    # M = R + Rᵀ - (trace-1) I has M[j,k] ∝ a_j a_k
    M = R + jnp.swapaxes(R, -1, -2)
    ka = jnp.take_along_axis(M, k[..., None, None].repeat(3, axis=-2), axis=-1)[..., 0]
    anchor_col = jnp.where(
        jnp.arange(3) == k[..., None], jnp.ones_like(axis_abs), jnp.sign(ka)
    )
    axis_pi = axis_abs * anchor_col
    axis_pi = axis_pi / (jnp.linalg.norm(axis_pi, axis=-1, keepdims=True) + 1e-12)
    # resolve overall sign with w_asym when sin(theta) isn't exactly 0
    flip = jnp.sign(jnp.sum(axis_pi * w_asym, axis=-1, keepdims=True))
    flip = jnp.where(flip == 0, jnp.ones_like(flip), flip)
    w_pi = theta[..., None] * axis_pi * flip

    w = jnp.where(small[..., None], w_small, w_generic)
    w = jnp.where(near_pi[..., None], w_pi, w)
    del off
    return w


def inv_left_jacobian_so3(w: jax.Array) -> jax.Array:
    """Closed-form inverse of the SO(3) left Jacobian."""
    theta_sq = jnp.sum(w * w, axis=-1)
    small = theta_sq < _EPS
    safe_sq = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)
    theta = jnp.sqrt(safe_sq)
    half = theta * 0.5
    cot_coef_t = (1.0 - half * jnp.cos(half) / jnp.sin(half)) / safe_sq
    cot_coef_s = 1.0 / 12.0 + theta_sq / 720.0
    cot_coef = jnp.where(small, cot_coef_s, cot_coef_t)
    W = hat(w)
    WW = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + cot_coef[..., None, None] * WW


def exp(xi: jax.Array) -> jax.Array:
    """SE(3) exponential: (...,6) [upsilon, omega] -> (...,4,4)."""
    ups, omega = xi[..., :3], xi[..., 3:]
    R = exp_so3(omega)
    V = left_jacobian_so3(omega)
    t = jnp.einsum("...ij,...j->...i", V, ups)
    return rt_to_mat(R, t)


def log(T: jax.Array) -> jax.Array:
    """SE(3) logarithm: (...,4,4) -> (...,6) [upsilon, omega]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    omega = log_so3(R)
    Vinv = inv_left_jacobian_so3(omega)
    ups = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([ups, omega], axis=-1)


def rt_to_mat(R: jax.Array, t: jax.Array) -> jax.Array:
    """Assemble (...,4,4) from (...,3,3) rotation and (...,3) translation."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 4), dtype=R.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def identity(dtype=jnp.float32, batch: tuple = ()) -> jax.Array:
    return jnp.broadcast_to(jnp.eye(4, dtype=dtype), batch + (4, 4))


def inv(T: jax.Array) -> jax.Array:
    """Inverse of a rigid transform (...,4,4)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return rt_to_mat(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def transform(T: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply (...,4,4) to points.

    Convention: a 1-D (3,) input is ONE point; any ndim>=2 input is a point
    batch (...,N,3) with N broadcast against T's batch dims. To transform one
    point per pose, pass (B,1,3) and squeeze."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    if pts.ndim >= 2:
        return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]
    return jnp.einsum("...ij,...j->...i", R, pts) + t


def boxplus_left(xi: jax.Array, delta: jax.Array) -> jax.Array:
    """Left-multiplicative update on the 6-vector chart:
    log(exp(delta) @ exp(xi)) — reference registration.cpp:170."""
    return log(exp(delta) @ exp(xi))


def adjoint(T: jax.Array) -> jax.Array:
    """SE(3) adjoint: (...,4,4) -> (...,6,6) acting on [upsilon, omega]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    tR = hat(t) @ R
    Z = jnp.zeros_like(R)
    top = jnp.concatenate([R, tR], axis=-1)
    bot = jnp.concatenate([Z, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)
