import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_comments_ghr_tpu.ops import lie


def random_rotations(key, n):
    phi = jax.random.normal(key, (n, 3)) * 1.5
    return lie.so3_exp(phi)


class TestSO3:
    def test_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(0)
        phi = jax.random.normal(key, (64, 3)) * 2.0
        R = lie.so3_exp(phi)
        phi2 = lie.so3_log(R)
        np.testing.assert_allclose(lie.so3_exp(phi2), R, atol=1e-5)

    def test_exp_is_rotation(self):
        key = jax.random.PRNGKey(1)
        R = random_rotations(key, 32)
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-5)

    def test_small_angle(self):
        phi = jnp.array([[1e-9, 0, 0], [0.0, 0.0, 0.0]])
        R = lie.so3_exp(phi)
        np.testing.assert_allclose(R[1], jnp.eye(3), atol=1e-7)
        assert jnp.all(jnp.isfinite(lie.so3_log(R)))

    def test_near_pi(self):
        axis = jnp.array([0.0, 0.0, 1.0])
        phi = axis * (np.pi - 1e-4)
        R = lie.so3_exp(phi)
        phi2 = lie.so3_log(R)
        np.testing.assert_allclose(lie.so3_exp(phi2), R, atol=1e-4)

    def test_right_jacobian_fd(self):
        """J_r: exp(phi + d) ~= exp(phi) exp(J_r d)."""
        phi = jnp.array([0.3, -0.7, 0.2])
        d = jnp.array([1e-4, -2e-4, 3e-4])
        lhs = lie.so3_exp(phi + d)
        rhs = lie.so3_exp(phi) @ lie.so3_exp(lie.so3_right_jacobian(phi) @ d)
        np.testing.assert_allclose(lhs, rhs, atol=1e-6)

    def test_right_jacobian_inv(self):
        phi = jnp.array([[0.5, 0.1, -0.3], [1e-6, 0, 0]])
        J = lie.so3_right_jacobian(phi)
        Jinv = lie.so3_right_jacobian_inv(phi)
        eye = jnp.broadcast_to(jnp.eye(3), J.shape)
        np.testing.assert_allclose(J @ Jinv, eye, atol=1e-5)

    def test_grad_finite_at_zero(self):
        g = jax.grad(lambda p: jnp.sum(lie.so3_exp(p)))(jnp.zeros(3))
        assert jnp.all(jnp.isfinite(g))


class TestSE3:
    def test_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(2)
        xi = jax.random.normal(key, (32, 6))
        R, t = lie.se3_exp(xi)
        xi2 = lie.se3_log(R, t)
        R2, t2 = lie.se3_exp(xi2)
        np.testing.assert_allclose(R2, R, atol=1e-5)
        np.testing.assert_allclose(t2, t, atol=1e-4)

    def test_mul_inv(self):
        key = jax.random.PRNGKey(3)
        xi = jax.random.normal(key, (8, 6))
        R, t = lie.se3_exp(xi)
        Ri, ti = lie.se3_inv(R, t)
        Re, te = lie.se3_mul(R, t, Ri, ti)
        np.testing.assert_allclose(Re, jnp.broadcast_to(jnp.eye(3), Re.shape), atol=1e-5)
        np.testing.assert_allclose(te, 0.0, atol=1e-5)

    def test_apply(self):
        R = lie.so3_exp(jnp.array([0.0, 0.0, np.pi / 2]))
        t = jnp.array([1.0, 0.0, 0.0])
        p = jnp.array([1.0, 0.0, 0.0])
        np.testing.assert_allclose(lie.se3_apply(R, t, p), jnp.array([1.0, 1.0, 0.0]), atol=1e-6)


class TestSim3:
    def test_exp_log_roundtrip(self):
        key = jax.random.PRNGKey(4)
        xi = jax.random.normal(key, (32, 7)) * jnp.array([1, 1, 1, 1, 1, 1, 0.3])
        s, R, t = lie.sim3_exp(xi)
        xi2 = lie.sim3_log(s, R, t)
        s2, R2, t2 = lie.sim3_exp(xi2)
        np.testing.assert_allclose(s2, s, rtol=1e-4)
        np.testing.assert_allclose(R2, R, atol=1e-5)
        np.testing.assert_allclose(t2, t, atol=2e-4)

    def test_identity(self):
        s, R, t = lie.sim3_exp(jnp.zeros(7))
        np.testing.assert_allclose(s, 1.0, atol=1e-6)
        np.testing.assert_allclose(R, jnp.eye(3), atol=1e-6)
        np.testing.assert_allclose(t, 0.0, atol=1e-6)

    def test_mul_inv(self):
        key = jax.random.PRNGKey(5)
        xi = jax.random.normal(key, (4, 7)) * 0.5
        s, R, t = lie.sim3_exp(xi)
        si, Ri, ti = lie.sim3_inv(s, R, t)
        se, Re, te = lie.sim3_mul(s, R, t, si, Ri, ti)
        np.testing.assert_allclose(se, 1.0, atol=1e-5)
        np.testing.assert_allclose(Re, jnp.broadcast_to(jnp.eye(3), Re.shape), atol=1e-5)
        np.testing.assert_allclose(te, 0.0, atol=1e-4)

    def test_apply_scale(self):
        s = jnp.array(2.0)
        R = jnp.eye(3)
        t = jnp.array([0.0, 0.0, 1.0])
        p = jnp.array([1.0, 1.0, 1.0])
        np.testing.assert_allclose(
            lie.sim3_apply(s, R, t, p), jnp.array([2.0, 2.0, 3.0]), atol=1e-6
        )


class TestQuat:
    def test_roundtrip(self):
        key = jax.random.PRNGKey(6)
        R = random_rotations(key, 64)
        q = lie.mat_to_quat(R)
        np.testing.assert_allclose(lie.quat_to_mat(q), R, atol=1e-5)

    def test_quat_mul_matches_mat(self):
        key = jax.random.PRNGKey(7)
        Ra = random_rotations(jax.random.fold_in(key, 0), 8)
        Rb = random_rotations(jax.random.fold_in(key, 1), 8)
        qa, qb = lie.mat_to_quat(Ra), lie.mat_to_quat(Rb)
        lhs = lie.quat_to_mat(lie.quat_mul(qa, qb))
        np.testing.assert_allclose(lhs, Ra @ Rb, atol=1e-5)

    def test_special_rotations(self):
        # 180-degree rotations hit every Shepperd branch
        for axis in range(3):
            phi = jnp.zeros(3).at[axis].set(np.pi)
            R = lie.so3_exp(phi)
            q = lie.mat_to_quat(R)
            np.testing.assert_allclose(lie.quat_to_mat(q), R, atol=1e-5)

    def test_normalize_rotation(self):
        R = lie.so3_exp(jnp.array([0.2, 0.3, -0.1])) + 0.01
        Rn = lie.normalize_rotation(R)
        np.testing.assert_allclose(Rn @ Rn.T, jnp.eye(3), atol=1e-5)
