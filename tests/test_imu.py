import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_comments_ghr_tpu.ops import lie
from orb_slam3_comments_ghr_tpu.optim import imu


def simulate(T=100, hz=200.0, w_body=(0.1, -0.2, 0.3), a_world=(0.4, 0.1, -0.2),
             R0=None, v0=(0.3, -0.1, 0.2)):
    """Perfect IMU samples for constant body rate + constant world accel."""
    dt = 1.0 / hz
    w = jnp.array(w_body)
    a_w = jnp.array(a_world)
    v0 = jnp.array(v0)
    g = imu.GRAVITY_VEC
    R0 = jnp.eye(3) if R0 is None else R0
    accs, gyrs = [], []
    for i in range(T):
        # sample at the start of each interval (Euler forward, like the ref's
        # per-sample integration)
        Ri = R0 @ lie.so3_exp(w * (i * dt))
        f_b = Ri.T @ (a_w - g)  # specific force
        accs.append(f_b)
        gyrs.append(w)
    total_t = T * dt
    R_end = R0 @ lie.so3_exp(w * total_t)
    p_end = v0 * total_t + 0.5 * a_w * total_t**2
    v_end = v0 + a_w * total_t
    return (
        jnp.stack(accs), jnp.stack(gyrs), jnp.full((T,), dt),
        R0, v0, R_end, p_end, v_end, total_t,
    )


CAL = imu.default_calib()


class TestPreintegration:
    def test_predict_matches_analytic(self):
        acc, gyr, dts, R0, v0, R_end, p_end, v_end, t = simulate()
        pre = imu.preintegrate(acc, gyr, dts, jnp.zeros(6), CAL)
        assert abs(float(pre.dT) - t) < 1e-6
        Rp, pp, vp = imu.predict_state(R0, jnp.zeros(3), v0, jnp.zeros(6), pre)
        np.testing.assert_allclose(np.asarray(Rp), np.asarray(R_end), atol=2e-3)
        np.testing.assert_allclose(np.asarray(pp), np.asarray(p_end), atol=2e-3)
        np.testing.assert_allclose(np.asarray(vp), np.asarray(v_end), atol=5e-3)

    def test_padding_ignored(self):
        acc, gyr, dts, *_ = simulate(T=50)
        accp = jnp.concatenate([acc, jnp.ones((30, 3)) * 99])
        gyrp = jnp.concatenate([gyr, jnp.ones((30, 3)) * 99])
        dtsp = jnp.concatenate([dts, jnp.zeros(30)])
        p1 = imu.preintegrate(acc, gyr, dts, jnp.zeros(6), CAL)
        p2 = imu.preintegrate(accp, gyrp, dtsp, jnp.zeros(6), CAL)
        np.testing.assert_allclose(np.asarray(p1.dR), np.asarray(p2.dR), atol=1e-6)
        np.testing.assert_allclose(np.asarray(p1.dP), np.asarray(p2.dP), atol=1e-6)
        assert abs(float(p1.dT) - float(p2.dT)) < 1e-7

    def test_residual_zero_at_ground_truth(self):
        acc, gyr, dts, R0, v0, R_end, p_end, v_end, t = simulate()
        pre = imu.preintegrate(acc, gyr, dts, jnp.zeros(6), CAL)
        r = imu.inertial_residual(
            R0, jnp.zeros(3), v0, R_end, p_end, v_end, jnp.zeros(6), pre
        )
        assert float(jnp.linalg.norm(r)) < 0.01

    def test_bias_jacobian_first_order(self):
        """delta_with_bias linearization vs exact reintegration."""
        acc, gyr, dts, *_ = simulate()
        b0 = jnp.zeros(6)
        db = jnp.array([0.004, -0.003, 0.002, 0.03, -0.02, 0.04])
        pre0 = imu.preintegrate(acc, gyr, dts, b0, CAL)
        pre1 = imu.preintegrate(acc, gyr, dts, b0 + db, CAL)  # exact
        dR_lin, dV_lin, dP_lin = imu.delta_with_bias(pre0, b0 + db)
        np.testing.assert_allclose(np.asarray(dR_lin), np.asarray(pre1.dR), atol=2e-3)
        np.testing.assert_allclose(np.asarray(dV_lin), np.asarray(pre1.dV), atol=2e-3)
        np.testing.assert_allclose(np.asarray(dP_lin), np.asarray(pre1.dP), atol=2e-3)

    def test_covariance_grows(self):
        acc, gyr, dts, *_ = simulate(T=40)
        pre_s = imu.preintegrate(acc[:20], gyr[:20], dts[:20], jnp.zeros(6), CAL)
        pre_l = imu.preintegrate(acc, gyr, dts, jnp.zeros(6), CAL)
        assert float(jnp.trace(pre_l.C[:9, :9])) > float(jnp.trace(pre_s.C[:9, :9]))
        # information matrix is computable and positive definite
        info = imu.information(pre_l)
        eigs = jnp.linalg.eigvalsh(0.5 * (info + info.T))
        assert float(eigs.min()) > 0

    def test_gravity_only_free_fall(self):
        """Static body: accelerometer reads +g, predict should stay in place."""
        T = 200
        acc = jnp.tile(jnp.array([[0.0, 0.0, imu.GRAVITY]]), (T, 1))
        gyr = jnp.zeros((T, 3))
        dts = jnp.full((T,), 1.0 / 200.0)
        pre = imu.preintegrate(acc, gyr, dts, jnp.zeros(6), CAL)
        Rp, pp, vp = imu.predict_state(
            jnp.eye(3), jnp.zeros(3), jnp.zeros(3), jnp.zeros(6), pre
        )
        np.testing.assert_allclose(np.asarray(pp), 0.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(vp), 0.0, atol=1e-4)
