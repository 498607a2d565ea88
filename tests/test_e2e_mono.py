"""End-to-end monocular SLAM on a synthetic sequence (SURVEY.md §7.3 slice):
features -> init -> tracking -> mapping -> BA -> trajectory -> ATE."""

import numpy as np
import pytest

from orb_slam3_comments_ghr_tpu.ops import cameras
from orb_slam3_comments_ghr_tpu.system import SLAM
from orb_slam3_comments_ghr_tpu.utils import synthetic, evaluation
from orb_slam3_comments_ghr_tpu.utils.config import SlamConfig

CAM = cameras.euroc_cam0()


def run_sequence(n_frames=40, n_feat=512, seed=3):
    world = synthetic.make_world(seed, n_points=3000)
    poses = synthetic.circular_trajectory(n_frames)
    cfg = SlamConfig(
        n_features=n_feat,
        local_points_cap=2048,
        local_ba_points=2048,
        max_frames_between_kf=8,
        min_init_matches=60,
    )
    slam = SLAM(CAM, cfg)
    est = []
    for i, (R, t) in enumerate(poses):
        feats, _ = synthetic.render_features(
            world, CAM, R, t, n_feat=n_feat, seed=seed * 1000 + i
        )
        pose = slam.track_features(feats, i * 0.05)
        if pose is not None:
            est.append((i * 0.05, pose))
    return slam, est, synthetic.gt_trajectory(poses)


@pytest.fixture(scope="module")
def seq():
    return run_sequence()


class TestEndToEndMono:
    def test_initializes_and_tracks(self, seq):
        slam, est, gt = seq
        assert slam.state == "OK"
        assert len(est) > 30  # tracked most frames

    def test_builds_map(self, seq):
        slam, est, gt = seq
        assert slam.n_keyframes() >= 3
        assert slam.n_map_points() > 200

    def test_ate_under_threshold(self, seq):
        slam, est, gt = seq
        rmse = evaluation.ate_rmse(est, gt, with_scale=True)
        # trajectory spans ~4m; demand cm-level accuracy on clean synthetic data
        assert rmse < 0.05, f"ATE {rmse:.4f} m"

    def test_trajectory_export(self, seq, tmp_path):
        slam, est, gt = seq
        p = tmp_path / "traj.txt"
        slam.save_trajectory_tum(str(p))
        lines = p.read_text().strip().splitlines()
        assert len(lines) > 30
        assert len(lines[0].split()) == 8
