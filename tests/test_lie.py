"""Unit tests for SO3/SE3/Sim3 against scipy and group axioms."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from cut3r_slam_tpu.geometry import lie
from cut3r_slam_tpu.geometry.quaternion import (
    quat_to_matrix, matrix_to_quat, quat_multiply, quat_rotate,
)

RNG = np.random.default_rng(0)


def rand_quat(n):
    q = Rotation.random(n, random_state=42).as_quat()  # xyzw
    return jnp.asarray(q, dtype=jnp.float32)


def rand_se3(n):
    t = jnp.asarray(RNG.normal(size=(n, 3)), dtype=jnp.float32)
    return jnp.concatenate([t, rand_quat(n)], axis=-1)


class TestQuaternion:
    def test_quat_to_matrix_vs_scipy(self):
        q = rand_quat(16)
        R_ours = np.asarray(quat_to_matrix(q))
        R_scipy = Rotation.from_quat(np.asarray(q)).as_matrix()
        np.testing.assert_allclose(R_ours, R_scipy, atol=1e-5)

    def test_matrix_to_quat_roundtrip(self):
        q = rand_quat(64)
        q2 = matrix_to_quat(quat_to_matrix(q))
        # sign-standardized comparison
        qn = np.asarray(q)
        qn = np.where(qn[:, 3:4] < 0, -qn, qn)
        np.testing.assert_allclose(np.asarray(q2), qn, atol=1e-5)

    def test_quat_multiply_vs_scipy(self):
        q1, q2 = rand_quat(8), rand_quat(8)[::-1]
        ours = np.asarray(quat_multiply(q1, q2))
        sp = (Rotation.from_quat(np.asarray(q1)) * Rotation.from_quat(np.asarray(q2))).as_quat()
        # quats are sign-ambiguous
        flip = np.sign(np.sum(ours * sp, axis=-1, keepdims=True))
        np.testing.assert_allclose(ours, sp * flip, atol=1e-5)

    def test_quat_rotate(self):
        q = rand_quat(8)
        v = jnp.asarray(RNG.normal(size=(8, 3)), dtype=jnp.float32)
        ours = np.asarray(quat_rotate(q, v))
        sp = Rotation.from_quat(np.asarray(q)).apply(np.asarray(v))
        np.testing.assert_allclose(ours, sp, atol=1e-5)


class TestSO3:
    def test_exp_log_roundtrip(self):
        # log returns the principal rotation, so keep |phi| < pi
        phi = jnp.asarray(RNG.normal(size=(32, 3)) * 0.8, dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(lie.so3_log(lie.so3_exp(phi))), np.asarray(phi), atol=1e-4)

    def test_exp_vs_scipy(self):
        phi = np.asarray(RNG.normal(size=(16, 3)), dtype=np.float32)
        q = np.asarray(lie.so3_exp(jnp.asarray(phi)))
        sp = Rotation.from_rotvec(phi).as_quat()
        flip = np.sign(np.sum(q * sp, axis=-1, keepdims=True))
        np.testing.assert_allclose(q, sp * flip, atol=1e-5)

    def test_small_angle(self):
        phi = jnp.asarray([[1e-9, 0, 0], [0, 0, 0]], dtype=jnp.float32)
        q = lie.so3_exp(phi)
        assert np.all(np.isfinite(np.asarray(q)))
        np.testing.assert_allclose(np.asarray(q[1]), [0, 0, 0, 1], atol=1e-7)
        # gradient is finite at zero
        g = jax.grad(lambda p: jnp.sum(lie.so3_exp(p)))(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = jnp.asarray(RNG.normal(size=(32, 6)) * 0.8, dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(lie.se3_log(lie.se3_exp(xi))), np.asarray(xi), atol=1e-4)

    def test_mul_inv_identity(self):
        g = rand_se3(16)
        e = lie.se3_mul(g, lie.se3_inv(g))
        np.testing.assert_allclose(np.asarray(e[:, :3]), 0, atol=1e-5)
        np.testing.assert_allclose(np.abs(np.asarray(e[:, 6])), 1, atol=1e-5)

    def test_matrix_consistency(self):
        g1, g2 = rand_se3(8), rand_se3(8)[::-1]
        M = np.asarray(lie.se3_matrix(lie.se3_mul(g1, g2)))
        M2 = np.asarray(lie.se3_matrix(g1)) @ np.asarray(lie.se3_matrix(g2))
        np.testing.assert_allclose(M, M2, atol=1e-5)

    def test_from_matrix_roundtrip(self):
        g = rand_se3(16)
        g2 = lie.se3_from_matrix(lie.se3_matrix(g))
        np.testing.assert_allclose(
            np.asarray(lie.se3_matrix(g2)), np.asarray(lie.se3_matrix(g)), atol=1e-5)

    def test_act_matches_matrix(self):
        g = rand_se3(8)
        p = jnp.asarray(RNG.normal(size=(8, 3)), dtype=jnp.float32)
        ours = np.asarray(lie.se3_act(g, p))
        M = np.asarray(lie.se3_matrix(g))
        ref = np.einsum("nij,nj->ni", M[:, :3, :3], np.asarray(p)) + M[:, :3, 3]
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_retr_zero(self):
        g = rand_se3(4)
        g2 = lie.se3_retr(g, jnp.zeros((4, 6)))
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g), atol=1e-6)

    def test_exp_differentiable(self):
        g = jax.jacobian(lie.se3_exp)(jnp.zeros(6))
        assert np.all(np.isfinite(np.asarray(g)))
        # d(t)/d(tau) = I at identity
        np.testing.assert_allclose(np.asarray(g)[:3, :3], np.eye(3), atol=1e-5)


class TestSim3:
    def test_exp_log_roundtrip(self):
        xi = jnp.asarray(RNG.normal(size=(32, 7)) * 0.8, dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(lie.sim3_log(lie.sim3_exp(xi))), np.asarray(xi),
            rtol=1e-3, atol=1e-4)

    def test_matrix_consistency(self):
        xi1 = jnp.asarray(RNG.normal(size=(8, 7)) * 0.5, dtype=jnp.float32)
        xi2 = jnp.asarray(RNG.normal(size=(8, 7)) * 0.5, dtype=jnp.float32)
        g1, g2 = lie.sim3_exp(xi1), lie.sim3_exp(xi2)
        M = np.asarray(lie.sim3_matrix(lie.sim3_mul(g1, g2)))
        M2 = np.asarray(lie.sim3_matrix(g1)) @ np.asarray(lie.sim3_matrix(g2))
        np.testing.assert_allclose(M, M2, rtol=1e-4, atol=1e-5)

    def test_inv(self):
        xi = jnp.asarray(RNG.normal(size=(8, 7)) * 0.5, dtype=jnp.float32)
        g = lie.sim3_exp(xi)
        e = lie.sim3_mul(g, lie.sim3_inv(g))
        np.testing.assert_allclose(np.asarray(e[:, :3]), 0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(e[:, 7]), 1, atol=1e-5)

    def test_act_scale(self):
        g = jnp.asarray([[0, 0, 0, 0, 0, 0, 1, 2.0]])
        p = jnp.asarray([[1.0, 2.0, 3.0]])
        np.testing.assert_allclose(np.asarray(lie.sim3_act(g, p)), [[2, 4, 6]], atol=1e-6)

    def test_numeric_jacobian(self):
        """Central-difference check of sim3_exp, mirroring pgo_buffer.py:19-36."""
        xi0 = jnp.asarray(RNG.normal(size=7) * 0.3, dtype=jnp.float32)
        J_ad = jax.jacobian(lambda x: lie.sim3_exp(x))(xi0)
        eps = 1e-3
        J_num = np.zeros((8, 7), dtype=np.float64)
        for k in range(7):
            d = np.zeros(7, np.float32); d[k] = eps
            hi = np.asarray(lie.sim3_exp(xi0 + jnp.asarray(d)))
            lo = np.asarray(lie.sim3_exp(xi0 - jnp.asarray(d)))
            J_num[:, k] = (hi - lo) / (2 * eps)
        np.testing.assert_allclose(np.asarray(J_ad), J_num, rtol=2e-2, atol=2e-3)


class TestSim3NegativeSigmaSmallTheta:
    """Regression: sign-preserving clamp in _sim3_W (ADVICE r1, high).

    For sigma < 0 and theta ~ 0, a bare maximum(sigma^3, -1e-24) snapped the
    denominator to -1e-24 and produced ~1e22 translations. Ground truth via
    scipy.linalg.expm of the 4x4 sim(3) matrix representation:
      exp([[hat(phi)+sigma I, tau],[0,0]]) = [[s R, t],[0,1]].
    """

    def _expm_truth(self, xi):
        from scipy.linalg import expm
        tau, phi, sigma = xi[:3], xi[3:6], xi[6]
        hat = np.array([[0, -phi[2], phi[1]],
                        [phi[2], 0, -phi[0]],
                        [-phi[1], phi[0], 0]], dtype=np.float64)
        M = np.zeros((4, 4), dtype=np.float64)
        M[:3, :3] = hat + sigma * np.eye(3)
        M[:3, 3] = tau
        return expm(M)

    @pytest.mark.parametrize("sigma", [-0.5, -0.1, -1e-4, 1e-4, 0.1, 0.5])
    @pytest.mark.parametrize("theta", [0.0, 1e-6, 1e-3, 0.3])
    def test_exp_matches_expm(self, sigma, theta):
        tau = np.array([0.3, -0.7, 1.1])
        phi = np.array([0.6, 0.8, 0.0]) * theta
        xi = np.concatenate([tau, phi, [sigma]]).astype(np.float32)
        g = np.asarray(lie.sim3_exp(jnp.asarray(xi)), dtype=np.float64)
        T = self._expm_truth(xi)
        np.testing.assert_allclose(g[:3], T[:3, 3], rtol=1e-4, atol=1e-5)
        s = g[7]
        np.testing.assert_allclose(s, np.exp(sigma), rtol=1e-5)

    def test_log_roundtrip_negative_sigma(self):
        xi = np.array([0.3, -0.7, 1.1, 1e-5, -2e-5, 1e-5, -0.1], np.float32)
        back = np.asarray(lie.sim3_log(lie.sim3_exp(jnp.asarray(xi))))
        np.testing.assert_allclose(back, xi, rtol=1e-3, atol=1e-5)


class TestQuatNormalizeGrad:
    def test_zero_quat_grad_finite(self):
        """Regression: NaN gradient of linalg.norm at zero input (ADVICE r1)."""
        from cut3r_slam_tpu.geometry.quaternion import quat_normalize
        g = jax.grad(lambda q: jnp.sum(quat_normalize(q)))(jnp.zeros(4))
        assert np.all(np.isfinite(np.asarray(g)))
