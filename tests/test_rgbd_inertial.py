"""RGB-D-inertial end-to-end: depth gives metric scale from frame 1, the IMU
initialization must still converge (gravity/bias) and the fused pipeline must
track. Mirrors the reference's RGBD-inertial node
(Examples/ROS/ORB_SLAM3/src/ros_rgbd_inertial.cc; GrabImageRGBD + vImuMeas,
Tracking.cc:1644) — its one saved empirical run is RGB-D-inertial
(KeyFrameTrajectory_10181754.txt)."""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_comments_ghr_tpu.ops import cameras
from orb_slam3_comments_ghr_tpu.system import SLAM
from orb_slam3_comments_ghr_tpu.utils import synthetic, evaluation
from orb_slam3_comments_ghr_tpu.utils.config import SlamConfig, IMU_RGBD
from orb_slam3_comments_ghr_tpu.optim import imu as imu_mod

from test_rgbd import _depth_map

CAM = cameras.euroc_cam0()


class TestRgbdInertial:
    def test_e2e_imu_rgbd_images(self):
        """Real extractor on rendered images + exact depth maps + consistent
        IMU: the map must become IMU-initialized and the trajectory metric
        without any scale fit."""
        scene = synthetic.make_textured_scene(61)
        n_frames = 60
        poses, imu_rows, times = synthetic.vi_sequence(n_frames)
        cfg = SlamConfig(
            sensor=IMU_RGBD, n_features=768, local_points_cap=2048,
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
            img = synthetic.render_image(scene, CAM, R, t)
            depth = _depth_map(scene, CAM, R, t)
            pose = slam.track_rgbd(
                img, depth, times[i],
                imu_samples=chunk if len(chunk) else None)
            if pose is not None:
                est.append((times[i], pose))
        assert slam.map.map_imu_init.get(slam.map.active_map, False), \
            "IMU never initialized in IMU_RGBD mode"
        assert len(est) > 45
        gt = [
            (times[i], np.vstack([
                np.hstack([poses[i][0], poses[i][1][:, None]]), [0, 0, 0, 1]
            ]).astype(np.float32))
            for i in range(n_frames)
        ]
        # depth makes the map metric from frame 1: no scale fit allowed
        rmse = evaluation.ate_rmse(est, gt, with_scale=False)
        assert rmse < 0.12, rmse

    def test_feed_requires_inertial_config(self):
        cfg = SlamConfig(sensor=IMU_RGBD, n_features=256)
        calib = imu_mod.ImuCalib(
            Rbc=jnp.eye(3), tbc=jnp.zeros(3),
            noise_g=1e-4, noise_a=1e-3, walk_g=1e-6, walk_a=1e-5,
        )
        slam = SLAM(CAM, cfg, imu_calib=calib)
        assert slam.cfg.is_inertial
        assert slam.imu is not None
