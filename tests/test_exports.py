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


class TestCulledRefExport:
    def test_trajectory_through_culled_ref_kf_is_exact(self):
        """A frame whose reference KF is culled (then its parent culled too)
        must export its exact pose via the frozen mTcp chain
        (System.cc:760-847, KeyFrame.h:392)."""
        from orb_slam3_comments_ghr_tpu.map.state import MapState, MapConfig
        from orb_slam3_comments_ghr_tpu.pipeline.tracker import FrameRecord

        cam = cameras.euroc_cam0()
        slam = SLAM(cam, SlamConfig(n_features=64, enable_loop_closing=False))
        m = slam.map
        rng = np.random.default_rng(3)

        def rand_pose(i):
            # small random rotation via Rodrigues on a random axis
            w = rng.normal(size=3) * 0.2
            th = np.linalg.norm(w)
            k = w / max(th, 1e-9)
            K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
            R = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K
            return R.astype(np.float32), rng.normal(size=3).astype(np.float32)

        feats = {
            "xy": np.zeros((4, 2), np.float32), "level": np.zeros(4, np.int32),
            "angle": np.zeros(4, np.float32), "desc": np.zeros((4, 8), np.uint32),
            "valid": np.ones(4, bool), "u_right": np.full(4, -1.0, np.float32),
            "depth": np.full(4, -1.0, np.float32),
        }
        R0, t0 = rand_pose(0)
        R1, t1 = rand_pose(1)
        R2, t2 = rand_pose(2)
        k0 = m.add_keyframe(R0, t0, feats, 0.0)
        k1 = m.add_keyframe(R1, t1, feats, 1.0, parent=k0)
        k2 = m.add_keyframe(R2, t2, feats, 2.0, parent=k1)

        # a frame tracked against k2
        Rf, tf = rand_pose(3)
        T_fw = np.eye(4, dtype=np.float32); T_fw[:3, :3] = Rf; T_fw[:3, 3] = tf
        T_2w = np.eye(4, dtype=np.float32); T_2w[:3, :3] = R2; T_2w[:3, 3] = t2
        T_cr = T_fw @ np.linalg.inv(T_2w)
        slam.tracker.records.append(FrameRecord(5.0, k2, T_cr, False))

        # cull k2 then k1 (chain of two bad KFs)
        m.remove_keyframe(k2)
        m.remove_keyframe(k1)
        # afterwards, optimize k0 (move it) — export must follow
        d = np.eye(4, dtype=np.float32)
        d[:3, 3] = [0.1, -0.2, 0.3]
        T_0w = np.eye(4, dtype=np.float32); T_0w[:3, :3] = R0; T_0w[:3, 3] = t0
        T_0w_new = d @ T_0w
        m.kf_R[k0] = T_0w_new[:3, :3]
        m.kf_t[k0] = T_0w_new[:3, 3]

        traj = slam.trajectory()
        assert len(traj) == 1
        ts, T_cw = traj[0]
        # expected: frame pose moved by the same delta as its anchor chain
        T_expected = T_fw @ np.linalg.inv(T_0w) @ T_0w_new
        np.testing.assert_allclose(T_cw, T_expected, atol=1e-5)


class TestPoolGrowth:
    def test_kf_pool_grows_past_capacity(self):
        from orb_slam3_comments_ghr_tpu.map.state import MapState, MapConfig

        m = MapState(MapConfig(max_kf=4, max_mp=16, n_feat=8, obs_cap=4))
        feats = {
            "xy": np.zeros((8, 2), np.float32), "level": np.zeros(8, np.int32),
            "angle": np.zeros(8, np.float32), "desc": np.zeros((8, 8), np.uint32),
            "valid": np.ones(8, bool), "u_right": np.full(8, -1.0, np.float32),
            "depth": np.full(8, -1.0, np.float32),
        }
        for i in range(10):
            k = m.add_keyframe(np.eye(3, dtype=np.float32),
                               np.float32([i, 0, 0]), feats, float(i))
        assert m.n_kf == 10 and m.cfg.max_kf >= 10
        assert m.kf_valid[:10].all()
        assert (m.kf_t[9] == np.float32([9, 0, 0])).all()
        # mp pool growth
        ids = m.add_map_points(np.zeros((40, 3), np.float32),
                               np.zeros((40, 8), np.uint32), 0,
                               np.arange(40) % 8)
        assert (ids >= 0).all() and m.cfg.max_mp >= 40
