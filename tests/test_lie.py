"""Property tests for the Lie group module (exp/log roundtrips, group laws,
Jacobian identities) against numpy/scipy golden values."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from ygz_tpu.core import lie

KEY = jax.random.PRNGKey(0)


def rand_phi(key, n=64, scale=2.0):
    return jax.random.normal(key, (n, 3)) * scale


class TestSO3:
    def test_exp_matches_scipy(self):
        phi = np.asarray(rand_phi(KEY))
        q = np.asarray(lie.so3_exp(jnp.asarray(phi)))
        q_scipy = R.from_rotvec(phi).as_quat()  # (x,y,z,w)
        q_scipy = np.concatenate([q_scipy[:, 3:], q_scipy[:, :3]], axis=1)
        # quaternions are sign-ambiguous
        sign = np.sign(np.sum(q * q_scipy, axis=1, keepdims=True))
        np.testing.assert_allclose(q, q_scipy * sign, atol=1e-5)

    def test_log_roundtrip(self):
        phi = rand_phi(jax.random.PRNGKey(1), scale=0.8)
        # log is only injective inside |phi| < pi
        norm = jnp.linalg.norm(phi, axis=-1, keepdims=True)
        phi = phi * jnp.minimum(norm, 3.0) / jnp.maximum(norm, 1e-9)
        phi2 = lie.so3_log(lie.so3_exp(phi))
        np.testing.assert_allclose(np.asarray(phi), np.asarray(phi2), atol=1e-4)

    def test_small_angle(self):
        phi = jnp.array([[1e-9, 0, 0], [0.0, 0.0, 0.0]])
        q = lie.so3_exp(phi)
        assert np.all(np.isfinite(np.asarray(q)))
        np.testing.assert_allclose(np.asarray(lie.so3_log(q)), np.asarray(phi), atol=1e-7)

    def test_rotate_matches_matrix(self):
        phi = rand_phi(jax.random.PRNGKey(2), 16)
        v = jax.random.normal(jax.random.PRNGKey(3), (16, 3))
        q = lie.so3_exp(phi)
        r1 = lie.quat_rotate(q, v)
        r2 = jnp.einsum("nij,nj->ni", lie.quat_to_matrix(q), v)
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)

    def test_matrix_quat_roundtrip(self):
        phi = rand_phi(jax.random.PRNGKey(4), 64, scale=3.0)
        q = lie.so3_exp(phi)
        q2 = lie.matrix_to_quat(lie.quat_to_matrix(q))
        sign = jnp.sign(jnp.sum(q * q2, axis=-1, keepdims=True))
        np.testing.assert_allclose(np.asarray(q), np.asarray(q2 * sign), atol=1e-5)

    def test_left_jacobian_identity(self):
        # exp(phi + J_l^{-1}... ) first-order check: exp((phi+dphi)) ≈ exp(J_l dphi) exp(phi)
        phi = jnp.array([0.3, -0.2, 0.5])
        dphi = jnp.array([1e-4, 2e-4, -1e-4])
        lhs = lie.so3_exp(phi + dphi)
        Jl = lie.so3_left_jacobian(phi)
        rhs = lie.quat_mul(lie.so3_exp(Jl @ dphi), lie.so3_exp(phi))
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-6)

    def test_right_jacobian_inv(self):
        phi = jnp.array([0.7, 0.1, -0.4])
        Jr = lie.so3_right_jacobian(phi)
        Jri = lie.so3_right_jacobian_inv(phi)
        np.testing.assert_allclose(np.asarray(Jr @ Jri), np.eye(3), atol=1e-5)


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = jax.random.normal(jax.random.PRNGKey(5), (32, 6))
        # keep the rotation inside the injectivity radius |phi| < pi
        pn = jnp.linalg.norm(xi[:, 3:], axis=-1, keepdims=True)
        xi = jnp.concatenate(
            [xi[:, :3], xi[:, 3:] * jnp.minimum(pn, 3.0) / jnp.maximum(pn, 1e-9)], axis=1)
        T = lie.se3_exp(xi)
        xi2 = lie.se3_log(T)
        np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2), atol=1e-4)

    def test_compose_inverse(self):
        xi = jax.random.normal(jax.random.PRNGKey(6), (8, 6))
        T = lie.se3_exp(xi)
        I = lie.se3_compose(T, lie.se3_inverse(T))
        np.testing.assert_allclose(np.asarray(I["t"]), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.abs(np.asarray(I["q"][..., 0])), 1.0, atol=1e-5)

    def test_apply_matches_matrix(self):
        xi = jax.random.normal(jax.random.PRNGKey(7), (8, 6))
        T = lie.se3_exp(xi)
        p = jax.random.normal(jax.random.PRNGKey(8), (8, 3))
        r1 = lie.se3_apply(T, p)
        M = lie.se3_matrix(T)
        ph = jnp.concatenate([p, jnp.ones((8, 1))], axis=1)
        r2 = jnp.einsum("nij,nj->ni", M, ph)[:, :3]
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)

    def test_from_matrix_roundtrip(self):
        xi = jax.random.normal(jax.random.PRNGKey(9), (8, 6))
        T = lie.se3_exp(xi)
        T2 = lie.se3_from_matrix(lie.se3_matrix(T))
        np.testing.assert_allclose(np.asarray(T["t"]), np.asarray(T2["t"]), atol=1e-5)


class TestSim3:
    def test_exp_log_roundtrip(self):
        xi = jax.random.normal(jax.random.PRNGKey(10), (16, 7)) * 0.5
        S = lie.sim3_exp(xi)
        xi2 = lie.sim3_log(S)
        np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2), atol=1e-3)

    def test_compose_inverse(self):
        xi = jax.random.normal(jax.random.PRNGKey(11), (8, 7)) * 0.5
        S = lie.sim3_exp(xi)
        I = lie.sim3_compose(S, lie.sim3_inverse(S))
        np.testing.assert_allclose(np.asarray(I["t"]), 0.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(I["s"]), 1.0, atol=1e-5)

    def test_apply(self):
        S = lie.sim3(lie.so3_exp(jnp.array([0.1, 0.2, 0.3])),
                     jnp.array([1.0, 2.0, 3.0]), jnp.asarray(2.0))
        p = jnp.array([1.0, 0.0, 0.0])
        out = lie.sim3_apply(S, p)
        Rm = np.asarray(lie.quat_to_matrix(S["q"]))
        expect = 2.0 * Rm @ np.array([1.0, 0, 0]) + np.array([1.0, 2, 3])
        np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)


class TestSolver:
    def test_gauss_newton_quadratic(self):
        from ygz_tpu.core import solver
        # fit x to minimize ||Ax - y||^2 over a batch of problems
        A = jax.random.normal(jax.random.PRNGKey(12), (4, 8, 3))
        x_true = jax.random.normal(jax.random.PRNGKey(13), (4, 3))
        y = jnp.einsum("bij,bj->bi", A, x_true)

        def system(x):
            r = jnp.einsum("bij,bj->bi", A, x) - y
            H = jnp.einsum("bij,bik->bjk", A, A)
            b = -jnp.einsum("bij,bi->bj", A, r)
            return H, b, jnp.sum(r * r)

        x0 = jnp.zeros((4, 3))
        x, cost = solver.gauss_newton(system, lambda x, dx: x + dx, x0, num_iters=3)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_true), atol=1e-4)
        assert float(cost) < 1e-8

    def test_lm_rosenbrock_ish(self):
        from ygz_tpu.core import solver

        def system(x):
            # residuals of a mildly nonlinear LSQ
            r = jnp.stack([x[0] ** 2 - 2.0, x[1] - 1.0, 0.1 * (x[0] + x[1])])
            J = jax.jacfwd(lambda z: jnp.stack(
                [z[0] ** 2 - 2.0, z[1] - 1.0, 0.1 * (z[0] + z[1])]))(x)
            H = J.T @ J
            b = -J.T @ r
            return H, b, jnp.sum(r * r)

        x, cost = solver.levenberg_marquardt(
            system, lambda x, dx: x + dx, jnp.array([3.0, -3.0]), num_iters=25)
        # the regularizer 0.1*(x0+x1) makes the optimal cost ~0.0583
        assert float(cost) < 0.059
