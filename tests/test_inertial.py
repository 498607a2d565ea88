"""Inertial initialization (gravity/scale/bias/velocity) and VI pose
tracking on simulated IMU + visual data."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_comments_ghr_tpu.ops import lie, cameras
from orb_slam3_comments_ghr_tpu.optim import imu, inertial, pose_opt

CAL = imu.default_calib()
CAM = cameras.euroc_cam0()


def simulate_vi_sequence(K=8, seg_T=50, hz=100.0, bias=None, seed=0):
    """K body states 0.5s apart with piecewise-constant accel/gyro; returns
    true states + stacked preintegrations (with the given sensor bias)."""
    rng = np.random.default_rng(seed)
    dt = 1.0 / hz
    g = np.asarray(imu.GRAVITY_VEC)
    bias = np.zeros(6) if bias is None else np.asarray(bias)

    R = np.eye(3)
    p = np.zeros(3)
    v = np.array([0.4, 0.1, -0.2])
    states = [(R.copy(), p.copy(), v.copy())]
    pres = []
    for k in range(K - 1):
        w = rng.normal(0, 0.4, 3)
        a_w = rng.normal(0, 1.2, 3)
        accs, gyrs = [], []
        for i in range(seg_T):
            f_b = R.T @ (a_w - g)
            accs.append(f_b + bias[3:])
            gyrs.append(w + bias[:3])
            p = p + v * dt + 0.5 * a_w * dt * dt
            v = v + a_w * dt
            R = R @ np.asarray(lie.so3_exp(jnp.asarray(w * dt)))
        pres.append(
            imu.preintegrate(
                jnp.asarray(np.stack(accs), jnp.float32),
                jnp.asarray(np.stack(gyrs), jnp.float32),
                jnp.full((seg_T,), dt, jnp.float32),
                jnp.zeros(6),
                CAL,
            )
        )
        states.append((R.copy(), p.copy(), v.copy()))
    pre_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *pres)
    return states, pre_stack, bias


class TestInertialInit:
    def test_recovers_scale_gravity_bias(self):
        s_true = 3.0
        G = np.asarray(lie.so3_exp(jnp.array([0.08, -0.12, 0.0])))  # vw rotation
        bias_true = np.array([0.004, -0.006, 0.003, 0.05, -0.08, 0.04])
        states, pre, _ = simulate_vi_sequence(bias=bias_true, seed=3)
        K = len(states)
        Rwb = jnp.asarray(np.stack([G @ s[0] for s in states]), jnp.float32)
        pwb = jnp.asarray(np.stack([G @ s[1] / s_true for s in states]), jnp.float32)
        v0 = jnp.zeros((K, 3), jnp.float32)  # velocities unknown at init
        win = inertial.InertialWindow(
            Rwb=Rwb, pwb=pwb, vel0=v0, pre=pre, valid=jnp.ones(K - 1, bool)
        )
        Rwg, s, bias, vel, cost = inertial.inertial_init(
            win, prior_g=1e2, prior_a=1e5, optimize_scale=True
        )
        assert abs(float(s) - s_true) / s_true < 0.05, float(s)
        # gravity direction in visual frame
        g_est = np.asarray(Rwg) @ np.array([0, 0, -1.0])
        g_true = G @ np.array([0, 0, -1.0])
        assert np.dot(g_est, g_true) > 0.999
        np.testing.assert_allclose(np.asarray(bias[:3]), bias_true[:3], atol=0.01)
        # velocities: compare to scaled-rotated truth
        v_true = np.stack([G @ s_[2] / s_true for s_ in states])
        err = np.linalg.norm(np.asarray(vel) - v_true, axis=1)
        assert err.max() < 0.1, err.max()

    def test_stereo_mode_scale_fixed(self):
        bias_true = np.zeros(6)
        states, pre, _ = simulate_vi_sequence(bias=bias_true, seed=4)
        K = len(states)
        G = np.asarray(lie.so3_exp(jnp.array([0.05, 0.02, 0.0])))
        Rwb = jnp.asarray(np.stack([G @ s[0] for s in states]), jnp.float32)
        pwb = jnp.asarray(np.stack([G @ s[1] for s in states]), jnp.float32)
        win = inertial.InertialWindow(
            Rwb=Rwb, pwb=pwb, vel0=jnp.zeros((K, 3)), pre=pre,
            valid=jnp.ones(K - 1, bool),
        )
        Rwg, s, bias, vel, cost = inertial.inertial_init(
            win, prior_g=1e2, prior_a=1e5, optimize_scale=False
        )
        assert float(s) == 1.0
        g_est = np.asarray(Rwg) @ np.array([0, 0, -1.0])
        assert np.dot(g_est, G @ np.array([0, 0, -1.0])) > 0.999


class TestVIPoseTracking:
    def test_tracks_with_imu_and_vision(self):
        states, pre_stack, _ = simulate_vi_sequence(K=2, seed=5)
        (R1, p1, v1), (R2, p2, v2) = states
        pre = jax.tree.map(lambda a: a[0], pre_stack)
        # visual observations of world points from the TRUE current pose
        key = jax.random.PRNGKey(0)
        uv = jax.random.uniform(key, (256, 2)) * jnp.array([700.0, 440.0]) + 20
        rays = cameras.unproject(CAM, uv)
        z = jax.random.uniform(jax.random.fold_in(key, 1), (256, 1)) * 8 + 4
        # camera == body (Tcb = I): pc = Rbw (pw - pwb)
        pc = rays * z
        pw = (jnp.asarray(R2) @ pc.T).T + jnp.asarray(p2)
        uv_obs = uv + jax.random.normal(jax.random.fold_in(key, 2), (256, 2)) * 0.4
        obs = pose_opt.PoseObs(
            p_world=pw.astype(jnp.float32), uv=uv_obs,
            u_right=jnp.full((256,), -1.0), level=jnp.zeros((256,), jnp.int32),
            valid=jnp.ones((256,), bool),
        )
        prev = inertial.VIState(
            Rwb=jnp.asarray(R1, jnp.float32), pwb=jnp.asarray(p1, jnp.float32),
            vel=jnp.asarray(v1, jnp.float32), bias=jnp.zeros(6),
        )
        # predicted start: IMU dead-reckoning
        Rp, pp, vp = imu.predict_state(prev.Rwb, prev.pwb, prev.vel, prev.bias, pre)
        state0 = inertial.VIState(Rwb=Rp, pwb=pp, vel=vp, bias=prev.bias)
        st, inl, n, nxt = inertial.pose_inertial_optimize(
            CAM, state0, prev, pre, obs,
            (jnp.eye(3), jnp.zeros(3)), inertial.empty_prior(),
        )
        assert int(n) > 240
        assert float(jnp.linalg.norm(st.pwb - jnp.asarray(p2))) < 0.02
        assert float(jnp.linalg.norm(lie.so3_log(st.Rwb @ jnp.asarray(R2, jnp.float32).T))) < 0.01
        assert bool(nxt.valid)
        # prior information should be positive semidefinite and substantial
        evals = np.linalg.eigvalsh(np.asarray(nxt.H))
        assert evals.min() > -1e-3
