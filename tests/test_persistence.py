"""Atlas save/load + multi-session SLAM (map merge across sessions)."""

import numpy as np
import pytest

from orb_slam3_comments_ghr_tpu.ops import cameras
from orb_slam3_comments_ghr_tpu.system import SLAM
from orb_slam3_comments_ghr_tpu.map import persistence
from orb_slam3_comments_ghr_tpu.utils import synthetic
from orb_slam3_comments_ghr_tpu.utils.config import SlamConfig

CAM = cameras.euroc_cam0()


def _cfg():
    return SlamConfig(
        n_features=512, local_points_cap=2048, local_ba_points=2048,
        max_frames_between_kf=5, min_init_matches=60,
    )


@pytest.fixture(scope="module")
def session1(tmp_path_factory):
    world = synthetic.make_ring_world(17)
    poses = synthetic.circular_trajectory(120, arc=1.0, outward=True)
    slam = SLAM(CAM, _cfg())
    # session 1: first 60 frames (covers ~half the circle)
    for i in range(60):
        feats, _ = synthetic.render_features(world, CAM, *poses[i], n_feat=512, seed=1700 + i)
        slam.track_features(feats, i * 0.05)
    path = str(tmp_path_factory.mktemp("atlas") / "session1.npz")
    slam.save_atlas(path)
    return world, poses, slam, path


class TestPersistence:
    def test_roundtrip_identical(self, session1):
        world, poses, slam, path = session1
        m2 = persistence.load_atlas(path, voc=slam.voc)
        np.testing.assert_array_equal(m2.kf_valid, slam.map.kf_valid)
        np.testing.assert_allclose(m2.mp_pos, slam.map.mp_pos)
        np.testing.assert_array_equal(m2.mp_obs_kf, slam.map.mp_obs_kf)
        assert m2.n_kf == slam.map.n_kf

    def test_vocabulary_checksum_guard(self, session1, tmp_path):
        world, poses, slam, path = session1
        from orb_slam3_comments_ghr_tpu.retrieval.vocabulary import Vocabulary

        other = Vocabulary.random(k=8, L=2, seed=99, n_train=2000)
        with pytest.raises(ValueError, match="checksum"):
            persistence.load_atlas(path, voc=other)

    def test_multisession_relocalizes_into_loaded_map(self, session1):
        world, poses, slam, path = session1
        n_kf_s1 = slam.n_keyframes()
        slam2 = SLAM(CAM, _cfg())
        slam2.load_atlas(path, new_session=True)
        assert slam2.map.active_map == 1
        # session 2 revisits the start of the trajectory
        tracked = 0
        for i in range(25):
            feats, _ = synthetic.render_features(
                world, CAM, *poses[i], n_feat=512, seed=8800 + i
            )
            pose = slam2.track_features(feats, 100.0 + i * 0.05)
            if pose is not None:
                tracked += 1
        assert tracked > 10
        # either the new sub-map merged into the old one, or tracking simply
        # continued; in both cases the old keyframes must still exist
        assert slam2.n_keyframes() >= 2
        total_kfs = len(np.nonzero(slam2.map.kf_valid)[0])
        assert total_kfs >= n_kf_s1  # loaded keyframes retained
