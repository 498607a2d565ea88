"""Multi-map Atlas: tracking loss spawns a new sub-map; revisiting known
territory merges it back (LoopClosing merge path)."""

import numpy as np
import pytest

from orb_slam3_comments_ghr_tpu.ops import cameras
from orb_slam3_comments_ghr_tpu.system import SLAM
from orb_slam3_comments_ghr_tpu.utils import synthetic
from orb_slam3_comments_ghr_tpu.utils.config import SlamConfig

CAM = cameras.euroc_cam0()


class TestMapMerge:
    def test_lost_then_merge(self):
        world = synthetic.make_ring_world(23)
        poses = synthetic.circular_trajectory(160, arc=1.0, outward=True)
        cfg = SlamConfig(
            n_features=512, local_points_cap=2048, local_ba_points=2048,
            max_frames_between_kf=5, min_init_matches=60,
            recently_lost_secs=0.4,
            loop_min_kfs=8,  # short re-traverse: below the default 12-KF gate
        )
        slam = SLAM(CAM, cfg)
        # phase 1: frames 0..60
        for i in range(60):
            feats, _ = synthetic.render_features(world, CAM, *poses[i], n_feat=512, seed=2300 + i)
            slam.track_features(feats, i * 0.05)
        assert slam.n_keyframes() >= 4
        kfs_before = slam.n_keyframes()

        # kidnap: blank features for a while => LOST => new sub-map
        from orb_slam3_comments_ghr_tpu.frontend.types import empty_features
        blank = empty_features(512)
        for j in range(14):
            slam.track_features(blank, 3.0 + j * 0.05)
        maps_before_reinit = slam.map.n_maps
        assert maps_before_reinit >= 2  # a fresh sub-map was opened

        # phase 2: re-traverse the FIRST map's territory (poses 5..55) — the
        # new sub-map builds in known terrain, so the merge path must fire
        tracked = 0
        for j, i in enumerate(range(5, 56)):
            feats, _ = synthetic.render_features(world, CAM, *poses[i], n_feat=512, seed=9300 + i)
            p = slam.track_features(feats, 4.0 + j * 0.05)
            if p is not None:
                tracked += 1
        assert tracked > 20
        # by the time the circle closes, the sub-map should have merged (or
        # the tracker relocalized straight into the old map)
        merged = slam.loopcloser.n_merges >= 1
        relocalized = slam.map.active_map == 0
        assert merged or relocalized, (
            slam.loopcloser.n_merges, slam.map.active_map, slam.map.n_maps
        )
