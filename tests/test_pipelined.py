"""Cross-frame pipelined monocular tracking: rendered images through the real
extractor, with frame N+1's extraction dispatched before frame N's map
bookkeeping (System.track_monocular_pipelined). The trajectory must match the
synchronous fused path's quality."""

import numpy as np
import jax.numpy as jnp

from orb_slam3_comments_ghr_tpu.ops import cameras
from orb_slam3_comments_ghr_tpu.system import SLAM
from orb_slam3_comments_ghr_tpu.utils import synthetic, evaluation
from orb_slam3_comments_ghr_tpu.utils.config import SlamConfig

CAM = cameras.euroc_cam0()


def _cfg():
    return SlamConfig(
        n_features=768, local_points_cap=2048, local_ba_points=2048,
        max_frames_between_kf=8, min_init_matches=60,
    )


class TestPipelinedMono:
    def test_pipelined_matches_sync_quality(self):
        scene = synthetic.make_textured_scene(61)
        poses = synthetic.circular_trajectory(36)
        images = [synthetic.render_image(scene, CAM, R, t) for R, t in poses]
        gt = synthetic.gt_trajectory(poses)

        slam_p = SLAM(CAM, _cfg())
        n_out = 0
        for i, img in enumerate(images):
            pose = slam_p.track_monocular_pipelined(jnp.asarray(img), i * 0.05)
            if pose is not None:
                n_out += 1
        if slam_p.flush_pipeline() is not None:
            n_out += 1
        if hasattr(slam_p, "wait_idle"):
            slam_p.wait_idle()
        assert slam_p.worker_errors == 0
        traj = slam_p.trajectory()
        assert n_out > 25
        assert len(traj) > 25
        rmse = evaluation.ate_rmse(traj, gt, with_scale=True)
        assert rmse < 0.05, rmse

    def test_pipeline_latency_is_depth_frames(self):
        """The first `pipeline_depth` calls return None (frames in flight);
        flush retires them all."""
        scene = synthetic.make_textured_scene(61)
        poses = synthetic.circular_trajectory(6)
        slam = SLAM(CAM, _cfg())
        depth = slam.cfg.pipeline_depth
        for k in range(depth):
            img = synthetic.render_image(scene, CAM, *poses[k])
            assert slam.track_monocular_pipelined(jnp.asarray(img), k * 0.05) is None
        # flushing processes the in-flight frames (early mono frames may have
        # no pose yet -> None is acceptable; they must be consumed either way)
        slam.flush_pipeline()
        assert slam.tracker.frame_id >= depth - 1  # frames consumed (ids from -1)
        assert not slam._pipe
