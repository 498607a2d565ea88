"""Full visual-inertial BA on a simulated VI window with known ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_comments_ghr_tpu.ops import lie, cameras
from orb_slam3_comments_ghr_tpu.optim import imu, vi_ba

CAL = imu.default_calib()
CAM = cameras.euroc_cam0()


def build_problem(K=6, P=200, noise_px=0.4, seed=0, perturb=True):
    """Simulated body trajectory + landmarks + IMU; camera == body."""
    import sys
    sys.path.insert(0, "tests")
    from test_inertial import simulate_vi_sequence

    states, pre_stack, _ = simulate_vi_sequence(K=K, seed=seed)
    Rwb = jnp.asarray(np.stack([s[0] for s in states]), jnp.float32)
    pwb = jnp.asarray(np.stack([s[1] for s in states]), jnp.float32)
    vel = jnp.asarray(np.stack([s[2] for s in states]), jnp.float32)
    bias = jnp.zeros((K, 6))

    key = jax.random.PRNGKey(seed + 1)
    kp, kz, kn, kq = jax.random.split(key, 4)
    uv = jax.random.uniform(kp, (P, 2)) * jnp.array([700.0, 440.0]) + 20.0
    rays = cameras.unproject(CAM, uv)
    z = jax.random.uniform(kz, (P, 1)) * 8.0 + 5.0
    pc0 = rays * z
    pts = (Rwb[0] @ pc0.T).T + pwb[0]  # world landmarks (cam0 == body0 frame)

    obs_cam = jnp.broadcast_to(jnp.arange(K)[None], (P, K)).astype(jnp.int32)
    Rcw = jnp.swapaxes(Rwb, -1, -2)
    pc = jnp.einsum("kij,pj->pki", Rcw, pts) - jnp.einsum(
        "kij,kj->ki", Rcw, pwb
    )[None]
    uv_obs = cameras.project(CAM, pc) + jax.random.normal(kn, (P, K, 2)) * noise_px
    ok = cameras.in_image(CAM, uv_obs, 2.0) & (pc[..., 2] > 0.5)

    if perturb:
        dxi = jax.random.normal(kq, (K, 3)) * 0.01
        dR = jax.vmap(lie.so3_exp)(dxi)
        Rwb0 = jnp.einsum("kij,kjl->kil", Rwb, dR)
        pwb0 = pwb + jax.random.normal(kq, (K, 3)) * 0.03
        vel0 = vel + jax.random.normal(jax.random.fold_in(kq, 1), (K, 3)) * 0.1
        p0 = pts + jax.random.normal(jax.random.fold_in(kq, 2), (P, 3)) * 0.03
        # keep the first state exact (it is the fixed gauge)
        Rwb0 = Rwb0.at[0].set(Rwb[0])
        pwb0 = pwb0.at[0].set(pwb[0])
    else:
        Rwb0, pwb0, vel0, p0 = Rwb, pwb, vel, pts

    prob = vi_ba.VIBAProblem(
        Rwb=Rwb0, pwb=pwb0, vel=vel0, bias=bias,
        fixed=jnp.arange(K) < 1,
        Rcb=jnp.eye(3), tcb=jnp.zeros(3),
        p=p0, p_valid=jnp.ones((P,), bool),
        obs_cam=obs_cam, obs_uv=uv_obs, obs_ur=jnp.full((P, K), -1.0),
        obs_level=jnp.zeros((P, K), jnp.int32), obs_valid=ok,
        pre=pre_stack, pre_valid=jnp.ones(K - 1, bool),
    )
    return prob, (Rwb, pwb, vel, pts)


class TestVIBA:
    def test_recovers_states(self):
        prob, (Rg, pg, vg, ptg) = build_problem()
        Rwb, pwb, vel, bias, p, inl, cost = vi_ba.vi_bundle_adjust(
            CAM, prob, iters=15
        )
        p_err = jnp.linalg.norm(pwb - pg, axis=-1)
        assert float(p_err.max()) < 0.02, p_err
        v_err = jnp.linalg.norm(vel - vg, axis=-1)
        assert float(v_err.max()) < 0.08, v_err
        r_err = jnp.linalg.norm(
            jax.vmap(lie.so3_log)(jnp.einsum("kij,kjl->kil", Rwb, jnp.swapaxes(Rg, -1, -2))),
            axis=-1,
        )
        assert float(r_err.max()) < 0.01

    def test_reduces_cost(self):
        prob, _ = build_problem(seed=2)
        _, _, _, _, _, _, c0 = vi_ba.vi_bundle_adjust(CAM, prob, iters=0)
        _, _, _, _, _, _, c1 = vi_ba.vi_bundle_adjust(CAM, prob, iters=12)
        assert float(c1) < 0.2 * float(c0)

    def test_fixed_state_unmoved(self):
        prob, _ = build_problem(seed=3)
        Rwb, pwb, vel, bias, p, inl, cost = vi_ba.vi_bundle_adjust(CAM, prob, iters=8)
        np.testing.assert_allclose(np.asarray(Rwb[0]), np.asarray(prob.Rwb[0]), atol=1e-4)
        np.testing.assert_allclose(np.asarray(pwb[0]), np.asarray(prob.pwb[0]), atol=1e-4)

    def test_imu_constrains_scale_drift(self):
        """With IMU factors, a global scale perturbation of the initial guess
        must be corrected (mono-style drift) — pure-visual BA cannot do this."""
        prob, (Rg, pg, vg, ptg) = build_problem(seed=4, perturb=False)
        # scale everything by 1.05 around state 0 (gauge)
        s = 1.05
        pwb_s = prob.pwb[0] + (prob.pwb - prob.pwb[0]) * s
        p_s = prob.pwb[0] + (prob.p - prob.pwb[0]) * s
        prob_s = prob._replace(pwb=pwb_s, p=p_s, vel=prob.vel * s)
        Rwb, pwb, vel, bias, p, inl, cost = vi_ba.vi_bundle_adjust(
            CAM, prob_s, iters=15
        )
        # distances from gauge state should return to metric truth
        d_est = jnp.linalg.norm(pwb[1:] - pwb[0], axis=-1)
        d_gt = jnp.linalg.norm(pg[1:] - pg[0], axis=-1)
        ratio = d_est / jnp.maximum(d_gt, 1e-6)
        assert float(jnp.abs(ratio - 1.0).max()) < 0.02, ratio


class TestChunkedVIBA:
    """Whole-map point-chunked VI solver (vi_bundle_adjust_chunked): the
    inertial-GBA path that removes the dense solver's point-count ceiling
    (reference FullInertialBA optimizes ALL map points, Optimizer.cc:3254)."""

    def test_matches_dense_bite_solver(self):
        prob, _ = build_problem(K=6, P=256, seed=5)
        lam0 = jnp.asarray(1e-4, jnp.float32)
        out_d = vi_ba.vi_bundle_adjust_step(CAM, prob, lam0, iters=4)
        out_c = vi_ba.vi_bundle_adjust_chunked(
            CAM, prob, lam0, iters=4, point_chunk=64)
        names = ["Rwb", "pwb", "vel", "bias", "p", "lam"]
        for n, a, b in zip(names, out_d, out_c):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-3,
                err_msg=f"chunked solver diverges from dense on {n}")

    def test_reduces_cost_multi_chunk(self):
        prob, (Rg, pg, vg, ptg) = build_problem(K=6, P=256, seed=6)
        lam0 = jnp.asarray(1e-4, jnp.float32)
        Rwb, pwb, vel, bias, p, lam = vi_ba.vi_bundle_adjust_chunked(
            CAM, prob, lam0, iters=10, point_chunk=32)  # 8 chunks
        p_err = jnp.linalg.norm(pwb - pg, axis=-1)
        assert float(p_err.max()) < 0.03, p_err
        # gauge kept
        np.testing.assert_allclose(
            np.asarray(pwb[0]), np.asarray(prob.pwb[0]), atol=1e-4)


class TestVIRigObservations:
    """Second-camera (fisheye-stereo right view) observations in the
    INERTIAL BA: VIBAProblem.obs_rig applies the rig offset after the
    body->cam0 chain (EdgeSE3ProjectXYZToBody, OptimizableTypes.h:96-160)."""

    def _rig(self):
        R_rl = np.asarray(lie.so3_exp(jnp.array([0.0, 0.02, 0.0])),
                          np.float32).T
        t_rl = -R_rl @ np.array([0.11, 0.001, -0.002], np.float32)
        rig_R = jnp.asarray(np.stack([np.eye(3, dtype=np.float32), R_rl]))
        rig_t = jnp.asarray(np.stack([np.zeros(3, np.float32), t_rl]))
        return R_rl, t_rl, rig_R, rig_t

    def test_right_only_points_constrained_in_vi_ba(self):
        prob, (Rg, pg, vg, ptg) = build_problem(K=6, P=128, seed=9,
                                                perturb=False)
        R_rl, t_rl, rig_R, rig_t = self._rig()
        P, D = prob.obs_cam.shape
        n_r = 12
        obs_rig = np.zeros((P, D), np.int32)
        obs_rig[:n_r] = 1  # these points are observed ONLY by the right cam
        # re-render the right-only observations through the rig chain
        Rcw = jnp.swapaxes(prob.Rwb, -1, -2)  # camera == body in build_problem
        pc0 = (jnp.einsum("kij,pj->pki", Rcw, prob.p)
               - jnp.einsum("kij,kj->ki", Rcw, prob.pwb)[None])
        pc0 = jnp.take_along_axis(
            pc0, jnp.asarray(prob.obs_cam)[..., None], axis=1)
        pc = jnp.where(jnp.asarray(obs_rig)[..., None] == 1,
                       jnp.einsum("ij,pdj->pdi", jnp.asarray(R_rl), pc0)
                       + jnp.asarray(t_rl), pc0)
        uv = cameras.project(CAM, pc)
        ok = np.asarray(prob.obs_valid) & np.asarray(pc[..., 2] > 0.5)
        # perturb ONLY the right-only landmarks
        rng = np.random.default_rng(5)
        p0 = np.asarray(prob.p).copy()
        p0[:n_r] += rng.normal(0, 0.06, (n_r, 3)).astype(np.float32)
        prob_r = prob._replace(
            p=jnp.asarray(p0), obs_uv=uv, obs_valid=jnp.asarray(ok),
            obs_rig=jnp.asarray(obs_rig), rig_R=rig_R, rig_t=rig_t,
        )
        Rwb, pwb, vel, bias, p, inl, cost = vi_ba.vi_bundle_adjust(
            CAM, prob_r, iters=15)
        err = np.linalg.norm(np.asarray(p)[:n_r] - np.asarray(prob.p)[:n_r],
                             axis=-1)
        # only points with >= 2 valid right-view observations are
        # geometrically constrained (the rest have no gradient)
        n_obs = np.asarray(ok)[:n_r].sum(1)
        constrained = n_obs >= 2
        assert int(constrained.sum()) >= 8
        assert float(err[constrained].max()) < 0.01, (err, n_obs)

    def test_chunked_matches_dense_with_rig(self):
        prob, _ = build_problem(K=6, P=128, seed=10)
        _, _, rig_R, rig_t = self._rig()
        P, D = prob.obs_cam.shape
        obs_rig = np.zeros((P, D), np.int32)  # all-left: identity rig slot
        prob_r = prob._replace(obs_rig=jnp.asarray(obs_rig),
                               rig_R=rig_R, rig_t=rig_t)
        lam0 = jnp.asarray(1e-4, jnp.float32)
        out_d = vi_ba.vi_bundle_adjust_step(CAM, prob, lam0, iters=3)
        out_c = vi_ba.vi_bundle_adjust_chunked(
            CAM, prob_r, lam0, iters=3, point_chunk=64)
        for a, b in zip(out_d, out_c):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-3)
