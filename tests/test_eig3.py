"""Closed-form 3x3 eigendecomposition vs numpy.linalg.eigh."""
import jax
import jax.numpy as jnp
import numpy as np

from tloam_tpu.ops import eig3


def rand_sym(rng, n):
    A = rng.normal(size=(n, 3, 3))
    return (A + np.swapaxes(A, -1, -2)) / 2


def test_eigvals_match_numpy(rng):
    A = rand_sym(rng, 256)
    w = np.asarray(eig3.eigvalsh3(jnp.asarray(A)))
    w_ref = np.linalg.eigvalsh(A)
    assert np.allclose(w, w_ref, atol=1e-9)


def test_eigvecs_are_eigenvectors(rng):
    A = rand_sym(rng, 256)
    w, V = eig3.eigh3(jnp.asarray(A))
    w, V = np.asarray(w), np.asarray(V)
    for i in range(3):
        # A v = w v
        Av = np.einsum("nij,nj->ni", A, V[:, :, i])
        assert np.allclose(Av, w[:, i : i + 1] * V[:, :, i], atol=1e-7)
    # orthonormal frames
    VtV = np.einsum("nij,nik->njk", V, V)
    assert np.allclose(VtV, np.eye(3), atol=1e-8)


def test_degenerate_cases():
    # isotropic
    w, V = eig3.eigh3(2.0 * jnp.eye(3))
    assert np.allclose(w, 2.0)
    assert np.allclose(np.asarray(V) @ np.asarray(V).T, np.eye(3), atol=1e-8)
    # rank-1 (plane normal direction)
    n = np.array([1.0, 2.0, 3.0])
    n /= np.linalg.norm(n)
    A = np.outer(n, n)
    w, V = eig3.eigh3(jnp.asarray(A))
    assert np.allclose(np.asarray(w), [0, 0, 1], atol=1e-7)
    assert np.allclose(np.abs(np.asarray(V)[:, 2] @ n), 1.0, atol=1e-7)
    # zero matrix
    w, V = eig3.eigh3(jnp.zeros((3, 3)))
    assert np.all(np.isfinite(np.asarray(V)))


def test_plane_from_points(rng):
    # noisy plane with known normal
    n = np.array([0.0, 0.6, 0.8])
    d_true = -2.5
    basis = np.linalg.svd(np.eye(3) - np.outer(n, n))[0][:, :2]
    uv = rng.normal(size=(64, 2)) * 3
    pts = uv @ basis.T + (-d_true) * n + rng.normal(size=(64, 3)) * 1e-4
    mask = np.ones(64, bool)
    # append garbage masked out
    pts = np.concatenate([pts, rng.normal(size=(16, 3)) * 100])
    mask = np.concatenate([mask, np.zeros(16, bool)])
    nn, dd, cvr = eig3.plane_from_points(jnp.asarray(pts), jnp.asarray(mask))
    nn, dd = np.asarray(nn), float(dd)
    sign = np.sign(nn @ n)
    assert np.allclose(sign * nn, n, atol=1e-3)
    assert abs(sign * dd - d_true) < 1e-2
    assert float(cvr) < 1e-4


def test_line_from_points(rng):
    direc = np.array([1.0, 1.0, 0.0]) / np.sqrt(2)
    t = rng.normal(size=(32, 1)) * 5
    pts = t * direc + np.array([1.0, 2.0, 3.0]) + rng.normal(size=(32, 3)) * 1e-3
    c, d, is_line = eig3.line_from_points(jnp.asarray(pts), jnp.ones(32, bool))
    assert float(is_line) == 1.0
    assert np.allclose(np.abs(np.asarray(d) @ direc), 1.0, atol=1e-4)
    assert np.allclose(np.asarray(c), pts.mean(0), atol=1e-9)


def test_jit_vmap(rng):
    A = jnp.asarray(rand_sym(rng, 32))
    f = jax.jit(jax.vmap(eig3.eigh3))
    w, V = f(A)
    assert np.allclose(np.asarray(w), np.linalg.eigvalsh(np.asarray(A)), atol=1e-8)
