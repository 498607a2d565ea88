"""Loop closing: drift correction on a closed-circle trajectory, and
multi-map merge after a kidnap."""

import numpy as np
import jax
import pytest

from orb_slam3_comments_ghr_tpu.ops import cameras
from orb_slam3_comments_ghr_tpu.system import SLAM
from orb_slam3_comments_ghr_tpu.utils import synthetic, evaluation
from orb_slam3_comments_ghr_tpu.utils.config import SlamConfig

CAM = cameras.euroc_cam0()


def closed_loop_run(n_frames=160, seed=13, noise_px=0.7):
    """Full-circle outward-looking trajectory revisiting the start."""
    world = synthetic.make_ring_world(seed)
    poses = synthetic.circular_trajectory(n_frames, arc=1.06, outward=True)
    cfg = SlamConfig(
        n_features=512, local_points_cap=2048, local_ba_points=2048,
        max_frames_between_kf=5, min_init_matches=60,
    )
    slam = SLAM(CAM, cfg)
    est = []
    for i, (R, t) in enumerate(poses):
        feats, _ = synthetic.render_features(
            world, CAM, R, t, n_feat=512, seed=seed * 100 + i, noise_px=noise_px
        )
        pose = slam.track_features(feats, i * 0.05)
        if pose is not None:
            est.append((i * 0.05, pose))
    return slam, est, synthetic.gt_trajectory(poses)


class TestLoopClosing:
    @pytest.fixture(scope="class")
    def run(self):
        return closed_loop_run()

    def test_loop_detected(self, run):
        slam, est, gt = run
        assert slam.loopcloser.n_loops + slam.loopcloser.n_merges >= 1

    def test_trajectory_stays_accurate(self, run):
        slam, est, gt = run
        assert len(est) > 70
        rmse = evaluation.ate_rmse(est, gt, with_scale=True)
        assert rmse < 0.08, rmse

    def test_map_consistent_after_correction(self, run):
        slam, est, gt = run
        m = slam.map
        # all active-map points finite and within the scene extent (scaled)
        pts = m.mp_pos[m.mp_ids()]
        assert np.all(np.isfinite(pts))
        assert slam.state in ("OK", "RECENTLY_LOST")
