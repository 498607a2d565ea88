import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_comments_ghr_tpu.ops import lie, cameras
from orb_slam3_comments_ghr_tpu.optim import pose_opt, ba

CAM = cameras.euroc_cam0()


def make_scene(key, n_pts=256, depth_range=(4.0, 12.0)):
    """Random 3D points in front of the origin-facing camera."""
    k1, k2 = jax.random.split(key)
    uv = jax.random.uniform(k1, (n_pts, 2)) * jnp.array(
        [CAM.width - 40.0, CAM.height - 40.0]
    ) + 20.0
    rays = cameras.unproject(CAM, uv)
    z = jax.random.uniform(k2, (n_pts, 1)) * (depth_range[1] - depth_range[0]) + depth_range[0]
    return rays * z  # camera-frame points for identity pose


class TestPoseOptimization:
    def _problem(self, key, noise_px=0.5, outlier_frac=0.0, stereo=False):
        kp, kn, ko, kx = jax.random.split(key, 4)
        pts_w = make_scene(kp)  # world = cam frame of ground-truth pose identity
        # ground truth pose: identity. Start from a perturbed pose.
        xi = jnp.array([0.1, -0.08, 0.12, 0.02, -0.03, 0.015])
        R0, t0 = lie.se3_exp(xi)
        uv_clean = cameras.project(CAM, pts_w)
        uv = uv_clean + jax.random.normal(kn, uv_clean.shape) * noise_px
        n = pts_w.shape[0]
        if outlier_frac > 0:
            is_out = jax.random.uniform(ko, (n,)) < outlier_frac
            uv = jnp.where(is_out[:, None], uv + jax.random.normal(kx, uv.shape) * 40.0, uv)
        else:
            is_out = jnp.zeros((n,), bool)
        ur = (
            cameras.stereo_right_u(CAM, uv[:, 0], pts_w[:, 2])
            if stereo
            else jnp.full((n,), -1.0)
        )
        obs = pose_opt.PoseObs(
            p_world=pts_w,
            uv=uv,
            u_right=ur,
            level=jnp.zeros((n,), jnp.int32),
            valid=jnp.ones((n,), bool),
        )
        return R0, t0, obs, is_out

    def test_converges_to_ground_truth(self):
        R0, t0, obs, _ = self._problem(jax.random.PRNGKey(0), noise_px=0.3)
        R, t, inl, n = pose_opt.optimize_pose(CAM, R0, t0, obs)
        assert float(jnp.linalg.norm(t)) < 0.01  # ground-truth t = 0
        assert float(jnp.linalg.norm(lie.so3_log(R))) < 0.005
        assert int(n) > 240

    def test_rejects_outliers(self):
        R0, t0, obs, is_out = self._problem(
            jax.random.PRNGKey(1), noise_px=0.3, outlier_frac=0.25
        )
        R, t, inl, n = pose_opt.optimize_pose(CAM, R0, t0, obs)
        assert float(jnp.linalg.norm(t)) < 0.02
        # most outliers classified out
        marked_out = ~np.asarray(inl)
        assert np.mean(marked_out[np.asarray(is_out)]) > 0.8

    def test_stereo_observations(self):
        R0, t0, obs, _ = self._problem(jax.random.PRNGKey(2), noise_px=0.3, stereo=True)
        R, t, inl, n = pose_opt.optimize_pose(CAM, R0, t0, obs)
        assert float(jnp.linalg.norm(t)) < 0.01
        assert int(n) > 240

    def test_padded_invalid_ignored(self):
        R0, t0, obs, _ = self._problem(jax.random.PRNGKey(3))
        # invalidate half; corrupt their data wildly
        n = obs.valid.shape[0]
        valid = obs.valid.at[n // 2 :].set(False)
        uv = obs.uv.at[n // 2 :].set(1e6)
        obs = obs._replace(valid=valid, uv=uv)
        R, t, inl, cnt = pose_opt.optimize_pose(CAM, R0, t0, obs)
        assert float(jnp.linalg.norm(t)) < 0.02
        assert int(cnt) <= n // 2


class TestBundleAdjust:
    def _problem(self, key, K=6, P=128, noise_px=0.4, fix_first=True):
        kp, kn, kq = jax.random.split(key, 3)
        pts = make_scene(kp, P, (6.0, 14.0))
        # cameras on a small arc, looking at the cloud
        cam_t_gt = jnp.stack(
            [jnp.linspace(-1.0, 1.0, K), jnp.zeros(K), jnp.zeros(K)], axis=-1
        )
        cam_R_gt = jnp.broadcast_to(jnp.eye(3), (K, 3, 3))
        # world->cam: x_c = R (x_w - c) => t = -R c
        t_gt = -jnp.einsum("kij,kj->ki", cam_R_gt, cam_t_gt)

        # observations: every camera sees every point (D = K)
        obs_cam = jnp.broadcast_to(jnp.arange(K)[None, :], (P, K)).astype(jnp.int32)
        pc = jnp.einsum("kij,pj->pki", cam_R_gt, pts) + t_gt[None]
        uv = cameras.project(CAM, pc) + jax.random.normal(kn, (P, K, 2)) * noise_px
        inb = cameras.in_image(CAM, uv, margin=2.0) & (pc[..., 2] > 0.5)

        # perturb initial estimates
        dxi = jax.random.normal(kq, (K, 6)) * jnp.array([0.05] * 3 + [0.01] * 3)
        if fix_first:
            dxi = dxi.at[0].set(0.0).at[1].set(0.0)
        dR, dt = lie.se3_exp(dxi)
        R0, t0 = lie.se3_mul(dR, dt, cam_R_gt, t_gt)
        p0 = pts + jax.random.normal(kp, pts.shape) * 0.05

        prob = ba.BAProblem(
            cam_R=R0,
            cam_t=t0,
            cam_fixed=jnp.arange(K) < (2 if fix_first else 0),
            p=p0,
            p_valid=jnp.ones((P,), bool),
            obs_cam=obs_cam,
            obs_uv=uv,
            obs_ur=jnp.full((P, K), -1.0),
            obs_level=jnp.zeros((P, K), jnp.int32),
            obs_valid=inb,
        )
        return prob, cam_R_gt, t_gt, pts

    def test_bite_chaining_matches_monolithic(self):
        """Host-chained lam-threaded bites (bundle_adjust_step) must equal one
        monolithic bundle_adjust of the same total iters — the mapper's
        stream-sharing dispatch mode (mapper._run_ba share_stream path) is a
        pure scheduling change, not a numerical one."""
        prob, _, _, _ = self._problem(jax.random.PRNGKey(3))
        Rm, tm, pm, inl_m, _ = ba.bundle_adjust(CAM, prob, iters=6)
        lam = jnp.asarray(1e-4, jnp.float32)
        Rd, td, pd = prob.cam_R, prob.cam_t, prob.p
        for _ in range(3):
            probd = prob._replace(cam_R=Rd, cam_t=td, p=pd)
            Rd, td, pd, lam = ba.bundle_adjust_step(CAM, probd, lam, iters=2)
        probd = prob._replace(cam_R=Rd, cam_t=td, p=pd)
        inl_b = ba.classify_observations(CAM, probd)
        assert float(jnp.max(jnp.abs(Rd - Rm))) < 1e-6
        assert float(jnp.max(jnp.abs(td - tm))) < 1e-6
        assert float(jnp.max(jnp.abs(pd - pm))) < 1e-6
        assert bool(jnp.all(inl_b == inl_m))

    def test_reduces_reprojection_error(self):
        prob, Rg, tg, pg = self._problem(jax.random.PRNGKey(0))
        _, _, _, _, cost0 = ba.bundle_adjust(CAM, prob, iters=0)
        R, t, p, inl, cost = ba.bundle_adjust(CAM, prob, iters=15)
        assert float(cost) < 0.1 * float(cost0)

    def test_recovers_geometry(self):
        prob, Rg, tg, pg = self._problem(jax.random.PRNGKey(1))
        R, t, p, inl, cost = ba.bundle_adjust(CAM, prob, iters=20)
        # gauge is fixed by the 2 fixed cameras -> absolute comparison is fair
        t_err = jnp.linalg.norm(t - tg, axis=-1)
        assert float(jnp.max(t_err)) < 0.02
        rot_err = jnp.linalg.norm(lie.so3_log(R @ jnp.swapaxes(Rg, -1, -2)), axis=-1)
        assert float(jnp.max(rot_err)) < 0.01
        # mean residual per observation should be around the injected noise
        n_obs = float(jnp.sum(prob.obs_valid))
        assert float(cost) / n_obs < 3.0

    def test_fixed_cameras_do_not_move(self):
        prob, *_ = self._problem(jax.random.PRNGKey(2))
        R, t, p, inl, _ = ba.bundle_adjust(CAM, prob, iters=10)
        np.testing.assert_allclose(np.asarray(R[:2]), np.asarray(prob.cam_R[:2]), atol=1e-4)
        np.testing.assert_allclose(np.asarray(t[:2]), np.asarray(prob.cam_t[:2]), atol=1e-4)

    def test_stereo_ba(self):
        prob, Rg, tg, pg = self._problem(jax.random.PRNGKey(3))
        # add right-u observations from ground-truth depth (with noise)
        pc = jnp.einsum("kij,pj->pki", Rg, pg) + tg[None]
        ur = cameras.stereo_right_u(CAM, prob.obs_uv[..., 0], pc[..., 2])
        prob = prob._replace(obs_ur=ur)
        R, t, p, inl, cost = ba.bundle_adjust(CAM, prob, iters=15)
        t_err = jnp.linalg.norm(t - tg, axis=-1)
        assert float(jnp.max(t_err)) < 0.02

    def test_outlier_classification(self):
        prob, Rg, tg, pg = self._problem(jax.random.PRNGKey(4))
        # corrupt 10% of observations
        key = jax.random.PRNGKey(99)
        bad = jax.random.uniform(key, prob.obs_valid.shape) < 0.1
        uv_bad = prob.obs_uv + jnp.where(bad[..., None], 50.0, 0.0)
        prob = prob._replace(obs_uv=uv_bad)
        R, t, p, inl, cost = ba.bundle_adjust(CAM, prob, iters=15)
        flagged = ~np.asarray(inl) & np.asarray(prob.obs_valid)
        corrupted = np.asarray(bad) & np.asarray(prob.obs_valid)
        assert flagged[corrupted].mean() > 0.9


class TestResumableGlobalBA:
    """Chunked full-map solver (bundle_adjust_resumable): scatter assembly
    over point chunks must match the dense windowed solver's quality."""

    def _problem(self, key, K=10, P=192):
        return TestBundleAdjust._problem(TestBundleAdjust(), key, K=K, P=P)

    def test_matches_dense_solver(self):
        prob, Rg, tg, pg = self._problem(jax.random.PRNGKey(7))
        # chunk=64 -> 3 chunks; bites of 2 iters chained through (R,t,p,lam)
        Rj, tj, pj = prob.cam_R, prob.cam_t, prob.p
        lam = jnp.asarray(1e-4)
        for _ in range(8):
            Rj, tj, pj, lam = ba.bundle_adjust_resumable(
                CAM, prob._replace(cam_R=Rj, cam_t=tj, p=pj), lam,
                iters=2, point_chunk=64,
            )
        t_err = jnp.linalg.norm(tj - tg, axis=-1)
        assert float(jnp.max(t_err)) < 0.02
        rot_err = jnp.linalg.norm(
            lie.so3_log(Rj @ jnp.swapaxes(Rg, -1, -2)), axis=-1
        )
        assert float(jnp.max(rot_err)) < 0.01
        inl = ba.classify_observations(
            CAM, prob._replace(cam_R=Rj, cam_t=tj, p=pj)
        )
        assert float(jnp.mean(jnp.where(prob.obs_valid, inl, True))) > 0.95

    def test_fixed_cameras_do_not_move(self):
        prob, *_ = self._problem(jax.random.PRNGKey(8))
        Rj, tj, pj, lam = ba.bundle_adjust_resumable(
            CAM, prob, jnp.asarray(1e-4), iters=6, point_chunk=64
        )
        np.testing.assert_allclose(
            np.asarray(Rj[:2]), np.asarray(prob.cam_R[:2]), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(tj[:2]), np.asarray(prob.cam_t[:2]), atol=1e-4
        )
