"""Stereo-inertial pipeline: metric from depth AND gravity from IMU."""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_comments_ghr_tpu.ops import cameras
from orb_slam3_comments_ghr_tpu.system import SLAM
from orb_slam3_comments_ghr_tpu.utils import synthetic, evaluation
from orb_slam3_comments_ghr_tpu.utils.config import SlamConfig, IMU_STEREO
from orb_slam3_comments_ghr_tpu.optim import imu as imu_mod

CAM = cameras.euroc_cam0()


class TestStereoInertial:
    def test_e2e(self):
        world = synthetic.make_world(41, n_points=3000)
        n_frames = 70
        poses, imu_rows, times = synthetic.vi_sequence(n_frames)
        cfg = SlamConfig(
            sensor=IMU_STEREO, n_features=768, local_points_cap=2048,
            local_ba_points=2048, max_frames_between_kf=5,
            enable_loop_closing=False,
        )
        calib = imu_mod.ImuCalib(
            Rbc=jnp.eye(3), tbc=jnp.zeros(3),
            noise_g=1e-4, noise_a=1e-3, walk_g=1e-6, walk_a=1e-5,
        )
        slam = SLAM(CAM, cfg, imu_calib=calib)
        est = []
        for i, (R, t) in enumerate(poses):
            chunk = imu_rows[
                (imu_rows[:, 0] > (times[i - 1] if i else -1))
                & (imu_rows[:, 0] <= times[i])
            ]
            if len(chunk):
                slam.feed_imu(chunk)
            feats, _ = synthetic.render_features(
                world, CAM, R, t, n_feat=768, seed=5100 + i, stereo=True
            )
            pose = slam.track_features(feats, times[i])
            if pose is not None:
                est.append((times[i], pose))
        assert slam.map.map_imu_init.get(slam.map.active_map, False)
        assert len(est) > 55
        gt = [
            (times[i], np.vstack([
                np.hstack([poses[i][0], poses[i][1][:, None]]), [0, 0, 0, 1]
            ]).astype(np.float32))
            for i in range(n_frames)
        ]
        # stereo is metric from frame 1: no scale alignment allowed
        rmse = evaluation.ate_rmse(est, gt, with_scale=False)
        assert rmse < 0.08, rmse
