"""End-to-end monocular-inertial pipeline: IMU initialization must recover
gravity and metric scale on a synthetic VI sequence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam3_comments_ghr_tpu.ops import cameras, lie
from orb_slam3_comments_ghr_tpu.system import SLAM
from orb_slam3_comments_ghr_tpu.utils import synthetic, evaluation
from orb_slam3_comments_ghr_tpu.utils.config import SlamConfig, IMU_MONOCULAR
from orb_slam3_comments_ghr_tpu.optim import imu as imu_mod


@pytest.fixture(scope="module")
def vi_run():
    CAM = cameras.euroc_cam0()
    world = synthetic.make_world(31, n_points=3000)
    n_frames = 80
    poses, imu_rows, times = synthetic.vi_sequence(n_frames)
    cfg = SlamConfig(
        sensor=IMU_MONOCULAR, n_features=512, local_points_cap=2048,
        local_ba_points=2048, max_frames_between_kf=5, min_init_matches=60,
        enable_loop_closing=False,
    )
    # near-ideal IMU for a deterministic test
    calib = imu_mod.ImuCalib(
        Rbc=jnp.eye(3), tbc=jnp.zeros(3),
        noise_g=1e-4, noise_a=1e-3, walk_g=1e-6, walk_a=1e-5,
    )
    slam = SLAM(CAM, cfg, imu_calib=calib)
    est = []
    fed = 0
    for i, (R, t) in enumerate(poses):
        t_frame = times[i]
        chunk = imu_rows[(imu_rows[:, 0] > (times[i - 1] if i else -1)) & (imu_rows[:, 0] <= t_frame)]
        if len(chunk):
            slam.feed_imu(chunk)
        feats, _ = synthetic.render_features(world, CAM, R, t, n_feat=512, seed=4100 + i)
        pose = slam.track_features(feats, t_frame)
        if pose is not None:
            est.append((t_frame, pose))
    gt = [(times[i], np.vstack([np.hstack([poses[i][0], poses[i][1][:, None]]), [0, 0, 0, 1]]).astype(np.float32)) for i in range(n_frames)]
    return slam, est, gt


class TestVIPipeline:
    def test_imu_initialized(self, vi_run):
        slam, est, gt = vi_run
        assert slam.map.map_imu_init.get(slam.map.active_map, False)

    def test_metric_scale_recovered(self, vi_run):
        """After IMU init the mono map must be METRIC: ATE without scale
        alignment should be small."""
        slam, est, gt = vi_run
        assert len(est) > 60
        # only evaluate the post-init segment (pre-init frames are pre-rescale)
        t_init = slam.mapper.t_imu_init
        assert t_init is not None
        est_post = [(t, T) for t, T in est if t > t_init]
        gt_post = [(t, T) for t, T in gt if t > t_init]
        rmse_scaled = evaluation.ate_rmse(est_post, gt_post, with_scale=True)
        rmse_metric = evaluation.ate_rmse(est_post, gt_post, with_scale=False)
        assert rmse_scaled < 0.08, rmse_scaled
        assert rmse_metric < 0.25, rmse_metric

    def test_gravity_aligned(self, vi_run):
        """After ApplyScaledRotation the map's gravity must be -z: keyframe
        'down' axes should agree with the tilt used in simulation."""
        slam, est, gt = vi_run
        # body velocity of keyframes should be finite and small
        m = slam.map
        kfs = m.kf_ids()
        assert np.all(np.isfinite(m.kf_vel[kfs]))
