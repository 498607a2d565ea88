"""Non-rectified fisheye stereo: triangulated depths + metric tracking."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam3_comments_ghr_tpu.ops import cameras, lie
from orb_slam3_comments_ghr_tpu.pipeline import programs
from orb_slam3_comments_ghr_tpu.utils import synthetic


def kb8_pair():
    cam_l = cameras.Camera(
        kind=cameras.KANNALA_BRANDT8, fx=380.0, fy=380.0, cx=376.0, cy=240.0,
        k1=0.01, k2=-0.002, k3=0.001, k4=-0.0005, width=752, height=480,
    )
    cam_r = cameras.Camera(
        kind=cameras.KANNALA_BRANDT8, fx=382.0, fy=382.0, cx=370.0, cy=244.0,
        k1=0.012, k2=-0.001, k3=0.0008, k4=-0.0004, width=752, height=480,
    )
    R_lr = np.asarray(lie.so3_exp(jnp.array([0.0, 0.02, 0.0])), np.float32)
    t_lr = np.array([0.11, 0.001, -0.002], np.float32)  # ~11 cm baseline
    return cam_l, cam_r, R_lr, t_lr


class TestFisheyeStereoDepth:
    def test_recovers_metric_depth(self):
        cam_l, cam_r, R_lr, t_lr = kb8_pair()
        rng = np.random.default_rng(0)
        N = 512
        # world points in the LEFT camera frame
        uv_seed = rng.random((N, 2)).astype(np.float32) * [650, 420] + 50
        rays = np.asarray(cameras.unproject(cameras.pinhole_equivalent(cam_l),
                                            jnp.asarray(uv_seed)))
        z_true = (rng.random(N).astype(np.float32) * 6 + 3)
        X_l = rays * z_true[:, None]
        # right-frame coords: x_l = R_lr x_r + t_lr -> x_r = R_lr^T (x_l - t_lr)
        X_r = (X_l - t_lr) @ R_lr
        uv_l = np.asarray(cameras.project(cam_l, jnp.asarray(X_l)))
        uv_r = np.asarray(cameras.project(cam_r, jnp.asarray(X_r)))
        ok = (
            np.asarray(cameras.in_image(cam_l, jnp.asarray(uv_l), 8.0))
            & np.asarray(cameras.in_image(cam_r, jnp.asarray(uv_r), 8.0))
        )
        desc = rng.integers(0, 2**32, (N, 8), dtype=np.uint32)

        xy1 = cameras.undistort_points(cam_l, jnp.asarray(uv_l))
        xy2 = cameras.undistort_points(cam_r, jnp.asarray(uv_r))
        depth, ridx, rmatched = programs.fisheye_stereo_depth(
            cameras.pinhole_equivalent(cam_l), cameras.pinhole_equivalent(cam_r),
            xy1, jnp.zeros(N, jnp.int32), jnp.asarray(desc), jnp.asarray(ok),
            xy2, jnp.zeros(N, jnp.int32), jnp.asarray(desc), jnp.asarray(ok),
            jnp.asarray(R_lr), jnp.asarray(t_lr),
        )
        d = np.asarray(depth)
        # the match table must agree with the identity correspondence
        rid = np.asarray(ridx)
        rm = np.asarray(rmatched)
        assert (rid[rm] == np.nonzero(rm)[0]).mean() > 0.95
        got = d > 0
        assert got.sum() > 0.8 * ok.sum()
        err = np.abs(d[got] - z_true[got]) / z_true[got]
        assert np.median(err) < 0.01, np.median(err)

    def test_no_matches_without_overlap(self):
        cam_l, cam_r, R_lr, t_lr = kb8_pair()
        rng = np.random.default_rng(1)
        N = 256
        xy = jnp.asarray(rng.random((N, 2)).astype(np.float32) * 400 + 100)
        # unrelated descriptors on both sides -> TH_LOW should reject
        d1 = jnp.asarray(rng.integers(0, 2**32, (N, 8), dtype=np.uint32))
        d2 = jnp.asarray(rng.integers(0, 2**32, (N, 8), dtype=np.uint32))
        depth, _, _ = programs.fisheye_stereo_depth(
            cameras.pinhole_equivalent(cam_l), cameras.pinhole_equivalent(cam_r),
            xy, jnp.zeros(N, jnp.int32), d1, jnp.ones(N, bool),
            xy, jnp.zeros(N, jnp.int32), d2, jnp.ones(N, bool),
            jnp.asarray(R_lr), jnp.asarray(t_lr),
        )
        assert int((np.asarray(depth) > 0).sum()) < 10


class TestSecondCameraFactor:
    """BAProblem.obs_rig: the reference's EdgeSE3ProjectXYZToBody
    (OptimizableTypes.h:96-160) — observations taken by a second rigidly
    mounted camera constrain landmarks through the rig extrinsics."""

    def _problem(self, right_only_n=8, with_right=True):
        from orb_slam3_comments_ghr_tpu.optim import ba

        rng = np.random.default_rng(3)
        cam = cameras.pinhole_equivalent(kb8_pair()[0])
        _, _, R_lr, t_lr = kb8_pair()
        R_rl = R_lr.T
        t_rl = -R_lr.T @ t_lr
        K, P, D = 4, 64, 6
        # small camera arc
        cam_R = np.stack([np.asarray(lie.so3_exp(jnp.array([0.0, 0.05 * k, 0.0])))
                          for k in range(K)]).astype(np.float32)
        cam_t = (rng.random((K, 3)).astype(np.float32) - 0.5) * 0.2
        # points in front of the rig
        uv_seed = rng.random((P, 2)).astype(np.float32) * [600, 400] + 70
        rays = np.asarray(cameras.unproject(cam, jnp.asarray(uv_seed)))
        z = rng.random(P).astype(np.float32) * 5 + 4
        p_true = (rays * z[:, None] - cam_t[0]) @ cam_R[0]  # world frame

        obs_cam = np.tile(np.arange(D, dtype=np.int32)[None] % K, (P, 1))
        obs_rig = np.zeros((P, D), np.int32)
        obs_rig[:right_only_n] = 1  # these points are seen ONLY right
        pc0 = np.einsum("pdij,pj->pdi", cam_R[obs_cam], p_true) + cam_t[obs_cam]
        pc = np.where(obs_rig[..., None] == 1,
                      np.einsum("ij,pdj->pdi", R_rl, pc0) + t_rl, pc0)
        uv = np.asarray(cameras.project(cam, jnp.asarray(pc)))
        obs_valid = (pc[..., 2] > 0.5) & np.asarray(
            cameras.in_image(cam, jnp.asarray(uv), -1e5))
        if not with_right:
            obs_valid[:right_only_n] = False
        prob = ba.BAProblem(
            cam_R=jnp.asarray(cam_R), cam_t=jnp.asarray(cam_t),
            cam_fixed=jnp.ones(K, bool),   # pure triangulation problem
            p=jnp.asarray(p_true + rng.normal(0, 0.08, (P, 3)).astype(np.float32)),
            p_valid=jnp.ones(P, bool),
            obs_cam=jnp.asarray(obs_cam),
            obs_uv=jnp.asarray(uv.astype(np.float32)),
            obs_ur=jnp.full((P, D), -1.0),
            obs_level=jnp.zeros((P, D), jnp.int32),
            obs_valid=jnp.asarray(obs_valid),
            obs_rig=jnp.asarray(obs_rig),
            rig_R=jnp.asarray(np.stack([np.eye(3, dtype=np.float32), R_rl])),
            rig_t=jnp.asarray(np.stack([np.zeros(3, np.float32), t_rl])),
        )
        return prob, p_true, cam

    def test_right_only_points_constrained(self):
        from orb_slam3_comments_ghr_tpu.optim import ba

        prob, p_true, cam = self._problem()
        R, t, p, inlier, cost = ba.bundle_adjust(cam, prob, iters=12)
        err = np.linalg.norm(np.asarray(p) - p_true, axis=-1)
        # points observed ONLY by the right camera converge to truth
        assert float(err[:8].max()) < 0.01, err[:8]
        assert float(err[8:].max()) < 0.01, err[8:].max()

    def test_without_right_obs_unconstrained(self):
        """Control: with the right rows invalidated, the right-only points
        keep their perturbation — the constraint really comes from the
        second-camera factor."""
        from orb_slam3_comments_ghr_tpu.optim import ba

        prob, p_true, cam = self._problem(with_right=False)
        R, t, p, inlier, cost = ba.bundle_adjust(cam, prob, iters=12)
        err = np.linalg.norm(np.asarray(p) - p_true, axis=-1)
        assert float(err[:8].min()) > 0.01  # untouched perturbation remains

    def test_chunked_gba_matches_dense_with_rig(self):
        from orb_slam3_comments_ghr_tpu.optim import ba

        prob, p_true, cam = self._problem()
        lam0 = jnp.asarray(1e-4, jnp.float32)
        Rd, td, pd, _ = ba.bundle_adjust_step(cam, prob, lam0, iters=4)
        Rc, tc, pc, _ = ba.bundle_adjust_resumable(
            cam, prob, lam0, iters=4, point_chunk=32)
        np.testing.assert_allclose(np.asarray(pd), np.asarray(pc), atol=5e-3)


class TestFisheyeStereoPipeline:
    """End-to-end non-rectified fisheye stereo through track_stereo_fisheye:
    metric tracking + right-view observations landing in the map and in BA."""

    def test_e2e_with_right_observations(self):
        from dataclasses import replace

        from orb_slam3_comments_ghr_tpu.system import SLAM
        from orb_slam3_comments_ghr_tpu.utils import evaluation
        from orb_slam3_comments_ghr_tpu.utils.config import SlamConfig, STEREO

        cam_l, cam_r, R_lr, t_lr = kb8_pair()
        cam_l = replace(cam_l, bf=float(cam_l.fx) * float(t_lr[0]))
        # near-field world: depths 2-10 m so the 11 cm baseline triangulates
        # accurately and close points exist for the KF close-census
        world = synthetic.make_world(21, n_points=5000,
                                     center=(0.0, 0.0, 6.0),
                                     extent=(20.0, 12.0, 9.0))
        poses = synthetic.circular_trajectory(40, radius=2.5)
        cfg = SlamConfig(
            sensor=STEREO, n_features=768, local_points_cap=2048,
            local_ba_points=2048, max_frames_between_kf=8,
            enable_loop_closing=False,
        )
        slam = SLAM(cam_l, cfg)
        R_rl = R_lr.T
        t_rl = -R_lr.T @ t_lr
        est = []
        for i, (R, t) in enumerate(poses):
            fl, _ = synthetic.render_features(
                world, cam_l, R, t, n_feat=768, seed=910 + i)
            R_r = (R_rl @ R).astype(np.float32)
            t_r = (R_rl @ t + t_rl).astype(np.float32)
            fr, _ = synthetic.render_features(
                world, cam_r, R_r, t_r, n_feat=768, seed=5910 + i)
            pose = slam.track_stereo_fisheye(
                None, None, cam_r, R_lr, t_lr, i * 0.05, features=(fl, fr))
            if pose is not None:
                est.append((i * 0.05, pose))
        m = slam.map
        assert m.rig is not None
        n_right = int((m.mp_obs_r_level >= 0).sum())
        assert n_right > 50, n_right
        assert len(est) > 30
        rmse = evaluation.ate_rmse(
            est, synthetic.gt_trajectory(poses), with_scale=False)
        assert rmse < 0.10, rmse
        # the BA problem builder must surface those right rows to the solver
        from orb_slam3_comments_ghr_tpu.pipeline.mapper import _build_obs_tables

        kfs = [int(k) for k in m.kf_ids()]
        pts = m.local_point_ids(kfs, None)
        slot = {c: i for i, c in enumerate(kfs)}
        tabs = _build_obs_tables(m, pts, slot, len(pts))
        obs_valid, obs_rig = tabs[4], tabs[5]
        D = m.cfg.obs_cap
        assert obs_rig is not None
        assert int(obs_valid[:, D:].sum()) > 50
        assert (obs_rig[:, D:] == 1).all()
