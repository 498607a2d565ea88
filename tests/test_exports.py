"""Trajectory export formats: TUM / EuRoC / KITTI / keyframe-only."""

import numpy as np
import pytest

from orb_slam3_comments_ghr_tpu.ops import cameras
from orb_slam3_comments_ghr_tpu.system import SLAM
from orb_slam3_comments_ghr_tpu.utils import synthetic
from orb_slam3_comments_ghr_tpu.utils.config import SlamConfig


@pytest.fixture(scope="module")
def tracked_slam():
    cam = cameras.euroc_cam0()
    world = synthetic.make_world(81, n_points=2500)
    poses = synthetic.circular_trajectory(25)
    cfg = SlamConfig(n_features=512, local_points_cap=2048,
                     local_ba_points=1024, max_frames_between_kf=6,
                     min_init_matches=60)
    slam = SLAM(cam, cfg)
    for i, (R, t) in enumerate(poses):
        feats, _ = synthetic.render_features(world, cam, R, t, n_feat=512, seed=300 + i)
        slam.track_features(feats, 1000.0 + i * 0.05)
    assert slam.n_keyframes() >= 2
    return slam


class TestExports:
    def test_tum(self, tracked_slam, tmp_path):
        p = tmp_path / "t.txt"
        tracked_slam.save_trajectory_tum(str(p))
        rows = [l.split() for l in p.read_text().strip().splitlines()]
        assert len(rows) > 10
        assert all(len(r) == 8 for r in rows)
        # quaternions normalized
        q = np.array([[float(x) for x in r[4:8]] for r in rows])
        np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-4)

    def test_euroc_ns_timestamps(self, tracked_slam, tmp_path):
        p = tmp_path / "e.txt"
        tracked_slam.save_trajectory_euroc(str(p))
        first = p.read_text().strip().splitlines()[0].split()
        assert len(first) == 8
        assert int(first[0]) > 10**11  # nanoseconds

    def test_kitti_rows(self, tracked_slam, tmp_path):
        p = tmp_path / "k.txt"
        tracked_slam.save_trajectory_kitti(str(p))
        rows = [l.split() for l in p.read_text().strip().splitlines()]
        assert all(len(r) == 12 for r in rows)
        # rotation part orthonormal
        T = np.array([float(x) for x in rows[0]]).reshape(3, 4)
        np.testing.assert_allclose(T[:3, :3] @ T[:3, :3].T, np.eye(3), atol=1e-4)

    def test_keyframe_trajectory(self, tracked_slam, tmp_path):
        p = tmp_path / "kf.txt"
        tracked_slam.save_keyframe_trajectory_tum(str(p))
        rows = p.read_text().strip().splitlines()
        assert len(rows) == tracked_slam.n_keyframes()
