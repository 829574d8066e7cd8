"""The four TLS residual/Jacobian families + GNC-TLS weight schedule.

TPU-native, fully batched analytic Jacobians replacing the reference's four
Ceres ``SizedCostFunction`` classes (reference: registration.cpp:14-160) and
its ``updateWeight`` GNC-TLS rule (registration.cpp:858-876). Instead of one
virtual ``Evaluate`` per correspondence on CPU threads, each family evaluates
ALL correspondences as one fused batch of elementwise ops + einsums that XLA
maps onto the VPU/MXU.

Derivative convention: left perturbation on the world-frame point,
``d(exp(delta) T p)/d delta = [ I | -(T p)^ ]`` with state ``[upsilon, omega]``
(matches registration.cpp:38-40 with its sign factored through).

Every function returns, per correspondence:
  r    — residual vector (R,) or (R,3)
  J    — Jacobian (R,6) or (R,3,6) w.r.t. the left-perturbation delta
  cost — the GNC bookkeeping scalar. NOTE the reference quirk, reproduced
         exactly: for the 3-residual families the "cost" written back for the
         GNC weight update is (r0+r1+r2)^2 — the square of the SUM of the
         weighted components (registration.cpp:32,69,143) — not the squared
         norm. For point-to-plane it is r^2 (registration.cpp:101).

Weights fold into both residual and Jacobian exactly as the reference does
(weight multiplies the raw residual AND dt_by_se3).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tloam_tpu.ops import se3


class ResidualBatch(NamedTuple):
    """Flattened per-correspondence residual data ready for normal equations.

    res  : (N, 3) residual components (1-res families put it in [..., 0])
    jac  : (N, 3, 6) Jacobian rows (zero-padded for 1-res families)
    cost : (N,) the GNC bookkeeping cost (see module docstring)
    valid: (N,) bool — whether this correspondence contributes
    """

    res: jax.Array
    jac: jax.Array
    cost: jax.Array
    valid: jax.Array


def _world(T: jax.Array, p: jax.Array) -> jax.Array:
    return se3.transform(T, p)


def point_to_point(
    T: jax.Array, source: jax.Array, target: jax.Array, weight: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Point-to-point residual (reference PointToPointErr, registration.cpp:19-47).

    r = w * (target - T source)           (3,)
    J = [ -w I | w (T source)^ ]          (3,6)
    """
    pw = _world(T, source)
    r = (target - pw) * weight[..., None]
    eye = jnp.eye(3, dtype=source.dtype)
    Jt = -eye * weight[..., None, None]
    Jr = se3.hat(pw) * weight[..., None, None]
    J = jnp.concatenate([Jt, Jr], axis=-1)
    cost = jnp.square(jnp.sum(r, axis=-1))
    return r, J, cost


def point_to_line(
    T: jax.Array,
    source: jax.Array,
    line_a: jax.Array,
    line_b: jax.Array,
    weight: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Point-to-line residual (reference PointToLineErr, registration.cpp:55-88).

    With pw = T source, nu = (pw - a) x (pw - b), de = a - b:
      r = w * nu / |de|                                   (3,)
      J = (b - a)^ @ [ w I | -w pw^ ] / |de|              (3,6)
    """
    pw = _world(T, source)
    nu = jnp.cross(pw - line_a, pw - line_b)
    de = line_a - line_b
    de_norm = jnp.linalg.norm(de, axis=-1)
    inv_de = 1.0 / jnp.maximum(de_norm, 1e-12)
    r = nu * (weight * inv_de)[..., None]

    eye = jnp.eye(3, dtype=source.dtype)
    dt = jnp.concatenate(
        [
            eye * weight[..., None, None],
            -se3.hat(pw) * weight[..., None, None],
        ],
        axis=-1,
    )  # (...,3,6)
    J = se3.hat(line_b - line_a) @ dt * inv_de[..., None, None]
    cost = jnp.square(jnp.sum(r, axis=-1))
    return r, J, cost


def point_to_plane(
    T: jax.Array,
    source: jax.Array,
    unit_norm: jax.Array,
    d: jax.Array,
    weight: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Point-to-plane residual (reference PointToPlaneErr, registration.cpp:96-117).

    r = n . (T source) + d                          scalar (unweighted! —
        the reference multiplies weight only into the Jacobian here)
    J = n^T @ [ w I | -w (T source)^ ]              (6,)
    """
    pw = _world(T, source)
    r = jnp.sum(unit_norm * pw, axis=-1) + d
    eye = jnp.eye(3, dtype=source.dtype)
    dt = jnp.concatenate(
        [
            eye * weight[..., None, None],
            -se3.hat(pw) * weight[..., None, None],
        ],
        axis=-1,
    )
    J = jnp.einsum("...i,...ij->...j", unit_norm, dt)
    cost = jnp.square(r)
    return r, J, cost


def plane_to_plane(
    T: jax.Array,
    source: jax.Array,
    source_cov: jax.Array,
    target: jax.Array,
    target_cov: jax.Array,
    weight: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """GICP-style plane-to-plane residual (reference PlaneToPlaneErr,
    registration.cpp:126-160).

    M = (C_t + R C_s R^T)^{-1};  r = w * M (target - T source)
    J = M @ [ -w I | w (T source)^ ]
    """
    R = T[..., :3, :3]
    pw = _world(T, source)
    d = target - pw
    RCR = target_cov + R @ source_cov @ jnp.swapaxes(R, -1, -2)
    M = jnp.linalg.inv(RCR)
    r = jnp.einsum("...ij,...j->...i", M, d) * weight[..., None]
    eye = jnp.eye(3, dtype=source.dtype)
    dt = jnp.concatenate(
        [
            -eye * weight[..., None, None],
            se3.hat(pw) * weight[..., None, None],
        ],
        axis=-1,
    )
    J = M @ dt
    cost = jnp.square(jnp.sum(r, axis=-1))
    return r, J, cost


# ---------------------------------------------------------------------------
# GNC-TLS schedule (reference registration.cpp:858-876, 1027-1033, 1049-1050,
# 1089)
# ---------------------------------------------------------------------------


def gnc_init_mu(
    max_residual: jax.Array,
    noise_bound_sq: jax.Array,
    inlier_mu: float = 1e-10,
) -> jax.Array:
    """mu init on iteration 0: mu = 1/(2 r_max / eps^2 - 1)
    (registration.cpp:1027-1033).

    The denominator goes non-positive exactly when 2*r_max <= eps^2 — the
    ALL-INLIER regime (every residual already inside the noise bound).
    `inlier_mu` picks that branch's value:
      * 1e-10 (default) reproduces the reference's clamp. NOTE this is
        catastrophic as a live schedule: with mu ~ 1e-10 the transition-band
        weight sqrt(eps^2 mu (mu+1)/r) spreads as 1/sqrt(r) over orders of
        magnitude, so quasi-zero-residual points dominate the normal
        equations and a CONVERGED solve explodes (measured: mean planar cost
        1.7e-4 -> 0.89 in one weighted round). The reference survives only
        because its mu ramps ~e^11.8 per iteration while Ceres' trust region
        bounds the damage.
      * large (e.g. 1e6): th2 = eps^2 mu/(mu+1) ~ eps^2 >= 2 r_max, so every
        cost sits below th2 and keeps weight 1 — GNC-TLS proper: with no
        outliers the convex surrogate is already exact and truncation stays
        off. Used by TLSConfig.mu_init="residual".
    """
    mu = 1.0 / (2.0 * max_residual / noise_bound_sq - 1.0)
    return jnp.where(mu <= 0.0, jnp.asarray(inlier_mu, mu.dtype), mu)


def gnc_thresholds(mu: jax.Array, noise_bound_sq: jax.Array):
    """(th1, th2) = ((mu+1)/mu, mu/(mu+1)) * eps^2 (registration.cpp:1049-1050)."""
    th1 = (mu + 1.0) / mu * noise_bound_sq
    th2 = mu / (mu + 1.0) * noise_bound_sq
    return th1, th2


def gnc_update_weights(
    weights: jax.Array,
    costs: jax.Array,
    noise_bound_sq: jax.Array,
    th1: jax.Array,
    th2: jax.Array,
    mu: jax.Array,
) -> jax.Array:
    """TLS weight update (registration.cpp:858-876).

    cost==0 keeps the previous weight (the reference `continue`s);
    cost>=th1 -> 0; cost<=th2 -> 1; else sqrt(eps^2 mu (mu+1)/cost) - mu.
    """
    safe = jnp.maximum(costs, 1e-30)
    mid = jnp.sqrt(noise_bound_sq * mu * (mu + 1.0) / safe) - mu
    w = jnp.where(costs >= th1, 0.0, jnp.where(costs <= th2, 1.0, mid))
    w = jnp.clip(w, 0.0, 1.0)
    return jnp.where(costs == 0.0, weights, w)


def gnc_next_mu(mu: jax.Array, iter_idx: jax.Array, gnc_factor: jax.Array) -> jax.Array:
    """mu <- mu * exp((iter+1) * gnc_factor) (registration.cpp:1089).

    Clamped at 1e8: the reference runs 4 f64 outer rounds (max mu ~5.6e30,
    finite); at 7 rounds in f32 the ramp overflows to inf, and
    gnc_thresholds(inf) is NaN (inf/inf) — NaN weights then freeze every
    remaining round (measured in gicp mode, round 4). At 1e8 the
    thresholds already sit within 1e-8 of their mu->inf limits, so the
    clamp is behaviorally invisible below f32 resolution."""
    return jnp.minimum(mu * jnp.exp((iter_idx + 1.0) * gnc_factor), 1e8)


def cauchy_weight(sq_norm: jax.Array, scale: float = 1.0) -> jax.Array:
    """IRLS weight of the Cauchy robust loss rho(s) = c^2 log(1 + s/c^2).

    The reference stacks ceres::CauchyLoss(1.0) on top of the TLS weights
    (registration.cpp:970); for our GN solver the equivalent is the IRLS
    reweighting rho'(s) = 1 / (1 + s/c^2).
    """
    c2 = scale * scale
    return 1.0 / (1.0 + sq_norm / c2)
