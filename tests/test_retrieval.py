"""Vocabulary, keyframe database, and relocalization."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam3_comments_ghr_tpu.ops import cameras
from orb_slam3_comments_ghr_tpu.retrieval.vocabulary import Vocabulary, score_l1
from orb_slam3_comments_ghr_tpu.retrieval.database import KeyFrameDatabase
from orb_slam3_comments_ghr_tpu.system import SLAM
from orb_slam3_comments_ghr_tpu.utils import synthetic
from orb_slam3_comments_ghr_tpu.utils.config import SlamConfig
from orb_slam3_comments_ghr_tpu.pipeline import tracker as trk

CAM = cameras.euroc_cam0()


@pytest.fixture(scope="module")
def voc():
    return Vocabulary.random(k=8, L=3, seed=1, n_train=5000)


class TestVocabulary:
    def test_transform_deterministic(self, voc):
        rng = np.random.default_rng(0)
        d = rng.integers(0, 2**32, (64, 8), dtype=np.uint32)
        w1, n1 = voc.transform(d, np.ones(64, bool))
        w2, n2 = voc.transform(d, np.ones(64, bool))
        np.testing.assert_array_equal(w1, w2)
        assert w1.min() >= 0 and w1.max() < voc.n_words

    def test_similar_descriptors_same_word(self, voc):
        """Descriptors a few bits apart should usually quantize together."""
        rng = np.random.default_rng(1)
        d = rng.integers(0, 2**32, (200, 8), dtype=np.uint32)
        d2 = d.copy()
        d2[:, 0] ^= 1  # flip one bit
        w1, _ = voc.transform(d, np.ones(200, bool))
        w2, _ = voc.transform(d2, np.ones(200, bool))
        assert (w1 == w2).mean() > 0.8

    def test_save_load_roundtrip(self, voc, tmp_path):
        p = str(tmp_path / "voc.npz")
        voc.save(p)
        v2 = Vocabulary.load(p)
        rng = np.random.default_rng(2)
        d = rng.integers(0, 2**32, (32, 8), dtype=np.uint32)
        w1, _ = voc.transform(d, np.ones(32, bool))
        w2, _ = v2.transform(d, np.ones(32, bool))
        np.testing.assert_array_equal(w1, w2)

    def test_bow_scoring(self, voc):
        rng = np.random.default_rng(3)
        d1 = rng.integers(0, 2**32, (128, 8), dtype=np.uint32)
        d2 = rng.integers(0, 2**32, (128, 8), dtype=np.uint32)
        w1, _ = voc.transform(d1, np.ones(128, bool))
        w2, _ = voc.transform(d2, np.ones(128, bool))
        v1 = voc.bow_vector(w1)
        v2 = voc.bow_vector(w2)
        self_score = score_l1(v1, v1)
        cross = score_l1(v1, v2)
        assert abs(self_score - 1.0) < 1e-5
        assert cross < self_score


def _run_seq(n_frames=60, world_seed=5):
    # outward panorama over a ring world: every heading sees different
    # structure, so the reference-faithful KF policy (c2 tracked-ratio gate)
    # distributes keyframes along the arc and retrieval is discriminative
    world = synthetic.make_ring_world(world_seed)
    poses = synthetic.circular_trajectory(n_frames, arc=0.7, outward=True)
    cfg = SlamConfig(
        n_features=512, local_points_cap=2048, local_ba_points=2048,
        max_frames_between_kf=6, min_init_matches=60,
    )
    slam = SLAM(CAM, cfg)
    for i, (R, t) in enumerate(poses):
        feats, _ = synthetic.render_features(world, CAM, R, t, n_feat=512, seed=777 + i)
        slam.track_features(feats, i * 0.05)
    return slam, world, poses


class TestRelocalization:
    def test_database_retrieves_matching_keyframe(self):
        slam, world, poses = _run_seq()
        assert slam.n_keyframes() >= 3
        # query with a frame rendered at the FIRST keyframe's viewpoint
        feats, _ = synthetic.render_features(world, CAM, *poses[0], n_feat=512, seed=9999)
        word, node = slam.voc.transform(np.asarray(feats.desc), np.asarray(feats.valid))
        qbow = slam.voc.bow_vector(word)
        cands = slam.kfdb.detect_relocalization_candidates(qbow, slam.map)
        assert len(cands) > 0
        # a returned candidate must view the query's scene region: its camera
        # center is among the closer half of keyframes to the query pose
        m = slam.map
        R0, t0 = poses[0]
        c_query = -R0.T @ t0
        kfs = m.kf_ids()
        d_all = sorted(
            float(np.linalg.norm(-m.kf_R[k].T @ m.kf_t[k] - c_query)) for k in kfs
        )
        d_best = min(
            float(np.linalg.norm(-m.kf_R[k].T @ m.kf_t[k] - c_query)) for k in cands
        )
        assert d_best <= d_all[len(d_all) // 2]

    def test_relocalize_after_kidnap(self):
        slam, world, poses = _run_seq()
        t = slam.tracker
        # kidnap: poison the pose/velocity and force RECENTLY_LOST
        t.state = trk.RECENTLY_LOST
        t.lost_since = 990.0
        t.velocity = None
        t.last_R = np.asarray(
            np.linalg.qr(np.random.default_rng(1).normal(size=(3, 3)))[0],
            np.float32,
        )
        t.last_t = np.array([55.0, -40.0, 13.0], np.float32)
        # feed a frame at a previously-visited viewpoint
        feats, _ = synthetic.render_features(world, CAM, *poses[2], n_feat=512, seed=1234)
        ok = t._relocalize(feats)
        assert ok
        # recovered pose must match the MAP-frame pose tracked at frame 2
        # (mono map scale is arbitrary — compare in map coordinates)
        rec = t.records[2]
        assert not rec.lost
        ref = rec.ref_kf
        T_rw = np.eye(4, dtype=np.float32)
        T_rw[:3, :3] = slam.map.kf_R[ref]
        T_rw[:3, 3] = slam.map.kf_t[ref]
        T_cw_frame2 = rec.T_cr @ T_rw
        c_frame2 = -T_cw_frame2[:3, :3].T @ T_cw_frame2[:3, 3]
        c_est = -t.last_R.T @ t.last_t
        assert np.linalg.norm(c_est - c_frame2) < 0.1
