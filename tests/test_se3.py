"""Unit tests for tloam_tpu.ops.se3 vs closed-form / scipy ground truth."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tloam_tpu.ops import se3


def random_xi(rng, n, scale_rot=1.0, scale_trans=1.0):
    ups = rng.normal(size=(n, 3)) * scale_trans
    w = rng.normal(size=(n, 3))
    w = w / np.linalg.norm(w, axis=-1, keepdims=True)
    theta = rng.uniform(0.0, scale_rot * np.pi * 0.95, size=(n, 1))
    return np.concatenate([ups, w * theta], axis=-1)


def test_hat_vee_roundtrip(rng):
    w = rng.normal(size=(17, 3))
    W = se3.hat(jnp.asarray(w))
    assert np.allclose(se3.vee(W), w)
    # skew-symmetry and cross-product property
    v = rng.normal(size=(17, 3))
    assert np.allclose(np.einsum("nij,nj->ni", np.asarray(W), v), np.cross(w, v))


def test_exp_so3_matches_scipy(rng):
    from scipy.spatial.transform import Rotation

    w = random_xi(rng, 64)[:, 3:]
    R = np.asarray(se3.exp_so3(jnp.asarray(w)))
    R_ref = Rotation.from_rotvec(w).as_matrix()
    assert np.allclose(R, R_ref, atol=1e-12)


def test_exp_log_roundtrip_se3(rng):
    xi = random_xi(rng, 128, scale_trans=10.0)
    T = se3.exp(jnp.asarray(xi))
    xi_back = np.asarray(se3.log(T))
    assert np.allclose(xi_back, xi, atol=1e-9)


def test_exp_log_small_angles(rng):
    xi = random_xi(rng, 32) * 1e-7
    T = se3.exp(jnp.asarray(xi))
    assert np.allclose(np.asarray(se3.log(T)), xi, atol=1e-14)
    # exact zero
    T0 = se3.exp(jnp.zeros(6))
    assert np.allclose(T0, np.eye(4))
    assert np.allclose(se3.log(jnp.eye(4)), np.zeros(6))


def test_log_near_pi(rng):
    from scipy.spatial.transform import Rotation

    w = rng.normal(size=(16, 3))
    w = w / np.linalg.norm(w, axis=-1, keepdims=True) * (np.pi - 1e-5)
    R = Rotation.from_rotvec(w).as_matrix()
    w_back = np.array(se3.log_so3(jnp.asarray(R)))  # copy: scipy needs writable
    R_back = Rotation.from_rotvec(w_back).as_matrix()
    assert np.allclose(R_back, R, atol=1e-6)


def test_inv_compose(rng):
    xi = random_xi(rng, 8)
    T = se3.exp(jnp.asarray(xi))
    eye = np.broadcast_to(np.eye(4), (8, 4, 4))
    assert np.allclose(T @ se3.inv(T), eye, atol=1e-12)


def test_transform_points(rng):
    xi = random_xi(rng, 1)[0]
    T = se3.exp(jnp.asarray(xi))
    pts = rng.normal(size=(100, 3))
    out = np.asarray(se3.transform(T, jnp.asarray(pts)))
    Tn = np.asarray(T)
    ref = pts @ Tn[:3, :3].T + Tn[:3, 3]
    assert np.allclose(out, ref, atol=1e-12)


def test_boxplus_left_matches_reference_semantics(rng):
    # registration.cpp:170 — x ⊞ δ = log(exp(δ)·exp(x))
    x = random_xi(rng, 4, scale_rot=0.5)
    d = random_xi(rng, 4, scale_rot=0.1) * 0.01
    out = se3.boxplus_left(jnp.asarray(x), jnp.asarray(d))
    T_ref = se3.exp(jnp.asarray(d)) @ se3.exp(jnp.asarray(x))
    assert np.allclose(se3.exp(out), T_ref, atol=1e-10)


def test_gradients_finite_at_zero():
    g = jax.grad(lambda xi: jnp.sum(se3.exp(xi)))(jnp.zeros(6))
    assert np.all(np.isfinite(g))
    g2 = jax.grad(lambda w: jnp.sum(se3.exp_so3(w)))(jnp.zeros(3))
    assert np.all(np.isfinite(g2))


def test_left_jacobian_identity():
    # exp([V u, w]) should have translation V u ... i.e. numerical check:
    # d/deps exp([eps*u, w]) translation = V(w) u
    w = jnp.asarray([0.3, -0.2, 0.5])
    u = jnp.asarray([1.0, 2.0, -1.0])
    V = se3.left_jacobian_so3(w)
    xi = jnp.concatenate([u, w])
    T = se3.exp(xi)
    assert np.allclose(T[:3, 3], V @ u, atol=1e-12)


def test_adjoint(rng):
    # Adj(T) xi == log(T exp(xi) T^-1) for small xi
    xi_T = random_xi(rng, 1, scale_rot=0.5)[0]
    T = se3.exp(jnp.asarray(xi_T))
    small = jnp.asarray(random_xi(rng, 1)[0] * 1e-4)
    lhs = se3.adjoint(T) @ small
    rhs = se3.log(T @ se3.exp(small) @ se3.inv(T))
    assert np.allclose(lhs, rhs, atol=1e-9)


def test_vmap_jit_compat(rng):
    xi = jnp.asarray(random_xi(rng, 16))
    f = jax.jit(jax.vmap(lambda x: se3.log(se3.exp(x))))
    assert np.allclose(f(xi), xi, atol=1e-9)
