"""Residual/Jacobian families vs finite differences and NumPy re-derivation.

The analytic formulas under test are the spec at reference
registration.cpp:19-160; Jacobians are w.r.t. a LEFT-multiplicative
perturbation delta: f(delta) = residual(exp(delta) @ T, ...).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tloam_tpu.ops import residuals as res
from tloam_tpu.ops import se3


def fd_jacobian(f, dim_out, eps=1e-7):
    """Finite-difference Jacobian of f: R^6 -> R^dim_out at delta=0."""
    J = np.zeros((dim_out, 6))
    for k in range(6):
        d = np.zeros(6)
        d[k] = eps
        J[:, k] = (np.asarray(f(jnp.asarray(d))) - np.asarray(f(jnp.asarray(-d)))) / (
            2 * eps
        )
    return J


@pytest.fixture
def T(rng):
    xi = rng.normal(size=6) * 0.3
    return se3.exp(jnp.asarray(xi))


def test_point_to_point(rng, T):
    src = jnp.asarray(rng.normal(size=(5, 3)))
    tgt = jnp.asarray(rng.normal(size=(5, 3)))
    w = jnp.asarray(rng.uniform(0.2, 1.0, size=(5,)))

    r, J, cost = res.point_to_point(T, src, tgt, w)
    # value vs numpy
    Tn = np.asarray(T)
    pw = src @ Tn[:3, :3].T + Tn[:3, 3]
    assert np.allclose(r, (np.asarray(tgt) - pw) * np.asarray(w)[:, None], atol=1e-12)
    # reference cost quirk: (r0+r1+r2)^2
    assert np.allclose(cost, np.square(np.sum(np.asarray(r), -1)))
    # Jacobian vs finite differences of the weighted residual
    for i in range(5):
        f = lambda d: res.point_to_point(se3.exp(d) @ T, src[i], tgt[i], w[i])[0]
        assert np.allclose(J[i], fd_jacobian(f, 3), atol=1e-5)


def test_point_to_line(rng, T):
    src = jnp.asarray(rng.normal(size=(5, 3)))
    a = jnp.asarray(rng.normal(size=(5, 3)))
    b = jnp.asarray(rng.normal(size=(5, 3)))
    w = jnp.asarray(rng.uniform(0.2, 1.0, size=(5,)))

    r, J, cost = res.point_to_line(T, src, a, b, w)
    Tn = np.asarray(T)
    pw = src @ Tn[:3, :3].T + Tn[:3, 3]
    nu = np.cross(pw - np.asarray(a), pw - np.asarray(b))
    de = np.linalg.norm(np.asarray(a - b), axis=-1, keepdims=True)
    assert np.allclose(r, nu / de * np.asarray(w)[:, None], atol=1e-12)
    assert np.allclose(cost, np.square(np.sum(np.asarray(r), -1)))
    for i in range(5):
        f = lambda d: res.point_to_line(se3.exp(d) @ T, src[i], a[i], b[i], w[i])[0]
        assert np.allclose(J[i], fd_jacobian(f, 3), atol=1e-5)


def test_point_to_plane(rng, T):
    src = jnp.asarray(rng.normal(size=(5, 3)))
    n = rng.normal(size=(5, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    n = jnp.asarray(n)
    d = jnp.asarray(rng.normal(size=(5,)))
    w = jnp.asarray(rng.uniform(0.2, 1.0, size=(5,)))

    r, J, cost = res.point_to_plane(T, src, n, d, w)
    Tn = np.asarray(T)
    pw = src @ Tn[:3, :3].T + Tn[:3, 3]
    assert np.allclose(r, np.sum(np.asarray(n) * pw, -1) + np.asarray(d), atol=1e-12)
    assert np.allclose(cost, np.square(np.asarray(r)))
    # NOTE: the reference's plane residual is unweighted but its Jacobian is
    # weighted (registration.cpp:100-112). Check J against FD of the residual
    # with the weight applied to the perturbation direction, i.e. J = w * dr/dd.
    for i in range(5):
        f = lambda dd: res.point_to_plane(se3.exp(dd) @ T, src[i], n[i], d[i], w[i])[0][
            None
        ]
        assert np.allclose(J[i], w[i] * fd_jacobian(f, 1)[0], atol=1e-5)


def test_plane_to_plane(rng, T):
    src = jnp.asarray(rng.normal(size=(4, 3)))
    tgt = jnp.asarray(rng.normal(size=(4, 3)))
    w = jnp.asarray(rng.uniform(0.2, 1.0, size=(4,)))

    def rand_cov():
        A = rng.normal(size=(3, 3))
        return A @ A.T + 0.1 * np.eye(3)

    cs = jnp.asarray(np.stack([rand_cov() for _ in range(4)]))
    ct = jnp.asarray(np.stack([rand_cov() for _ in range(4)]))

    r, J, cost = res.plane_to_plane(T, src, cs, tgt, ct, w)
    Tn = np.asarray(T)
    R = Tn[:3, :3]
    pw = src @ R.T + Tn[:3, 3]
    for i in range(4):
        M = np.linalg.inv(np.asarray(ct[i]) + R @ np.asarray(cs[i]) @ R.T)
        r_ref = M @ (np.asarray(tgt[i]) - pw[i]) * float(w[i])
        assert np.allclose(r[i], r_ref, atol=1e-10)
        # The reference treats M as constant when forming J (Gauss-Newton
        # approximation) — check against FD with M frozen.
        Mj = jnp.asarray(M)

        def f(d):
            Td = se3.exp(d) @ T
            pwd = se3.transform(Td, src[i])
            return (Mj @ (tgt[i] - pwd)) * w[i]

        assert np.allclose(J[i], fd_jacobian(f, 3), atol=1e-5)
    assert np.allclose(cost, np.square(np.sum(np.asarray(r), -1)))


def test_gnc_schedule():
    nb2 = 0.01 ** 2
    mu0 = res.gnc_init_mu(jnp.asarray(5.0), nb2)
    # 1/(2*5/1e-4 - 1) > 0 tiny
    assert float(mu0) == pytest.approx(1.0 / (2 * 5.0 / nb2 - 1.0))
    # non-positive -> 1e-10
    assert float(res.gnc_init_mu(jnp.asarray(1e-6), jnp.asarray(1.0))) == pytest.approx(
        1e-10
    )

    mu = jnp.asarray(0.5)
    th1, th2 = res.gnc_thresholds(mu, nb2)
    assert float(th1) == pytest.approx(3.0 * nb2)
    assert float(th2) == pytest.approx(nb2 / 3.0)

    costs = jnp.asarray([0.0, float(th1) + 1.0, float(th2) / 2, float(nb2)])
    prev_w = jnp.asarray([0.77, 0.5, 0.5, 0.5])
    w = res.gnc_update_weights(prev_w, costs, nb2, th1, th2, mu)
    assert float(w[0]) == pytest.approx(0.77)  # cost==0 keeps previous
    assert float(w[1]) == 0.0
    assert float(w[2]) == 1.0
    mid = np.sqrt(nb2 * 0.5 * 1.5 / nb2) - 0.5
    assert float(w[3]) == pytest.approx(mid)
    assert 0.0 <= float(w[3]) <= 1.0

    # mu growth (registration.cpp:1089)
    assert float(res.gnc_next_mu(jnp.asarray(1.0), jnp.asarray(0.0), 11.8)) == (
        pytest.approx(np.exp(11.8))
    )


def test_cauchy_weight():
    assert float(res.cauchy_weight(jnp.asarray(0.0))) == 1.0
    assert float(res.cauchy_weight(jnp.asarray(3.0))) == pytest.approx(0.25)
