"""Async mapping mode: tracking quality must hold with the mapping worker
running concurrently (the reference's pipeline parallelism)."""

import numpy as np
import pytest

from orb_slam3_comments_ghr_tpu.ops import cameras
from orb_slam3_comments_ghr_tpu.system import SLAM
from orb_slam3_comments_ghr_tpu.utils import synthetic, evaluation
from orb_slam3_comments_ghr_tpu.utils.config import SlamConfig

CAM = cameras.euroc_cam0()


class TestAsyncMapping:
    def test_e2e_async(self):
        world = synthetic.make_world(71, n_points=3000)
        poses = synthetic.circular_trajectory(40)
        cfg = SlamConfig(
            n_features=512, local_points_cap=2048, local_ba_points=2048,
            max_frames_between_kf=8, min_init_matches=60,
            async_mapping=True,
        )
        slam = SLAM(CAM, cfg)
        est = []
        for i, (R, t) in enumerate(poses):
            feats, _ = synthetic.render_features(world, CAM, R, t, n_feat=512, seed=7200 + i)
            pose = slam.track_features(feats, i * 0.05)
            if pose is not None:
                est.append((i * 0.05, pose))
        slam.wait_idle()
        assert slam.worker_errors == 0
        assert slam.state in ("OK", "RECENTLY_LOST")
        assert len(est) > 30
        assert slam.n_keyframes() >= 3
        rmse = evaluation.ate_rmse(est, synthetic.gt_trajectory(poses), with_scale=True)
        assert rmse < 0.08, rmse
