"""Image-based e2e tracking with in-plane rotation in the trajectory.

The camera rolls about its optical axis while orbiting the textured scene,
so matching survives only if the rBRIEF descriptors are steered by the
IC-angle orientation AND the rotation-histogram consistency check keeps the
dominant-rotation matches (ORBmatcher.cc:2077-2168 analog in
programs.track_against_points)."""

import numpy as np
import jax.numpy as jnp

from orb_slam3_comments_ghr_tpu.ops import cameras
from orb_slam3_comments_ghr_tpu.system import SLAM
from orb_slam3_comments_ghr_tpu.utils import synthetic, evaluation
from orb_slam3_comments_ghr_tpu.utils.config import SlamConfig

CAM = cameras.euroc_cam0()


def _roll(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


class TestInPlaneRotation:
    def test_tracking_survives_camera_roll(self):
        n_frames = 36
        scene = synthetic.make_textured_scene(21)
        base = synthetic.circular_trajectory(n_frames)
        # add a progressive roll of up to ~23 deg about the optical axis
        poses = []
        for i, (R, t) in enumerate(base):
            Rz = _roll(0.4 * np.sin(2 * np.pi * i / n_frames))
            poses.append(((Rz @ R).astype(np.float32),
                          (Rz @ t).astype(np.float32)))

        cfg = SlamConfig(
            n_features=768, local_points_cap=2048, local_ba_points=1024,
            max_frames_between_kf=6, min_init_matches=50,
        )
        slam = SLAM(CAM, cfg)
        est = []
        for i, (R, t) in enumerate(poses):
            img = synthetic.render_image(scene, CAM, R, t)
            pose = slam.track_monocular(jnp.asarray(img), i * 0.05)
            if pose is not None:
                est.append((i * 0.05, pose))
        # most frames tracked despite the roll ...
        assert len(est) > 0.6 * n_frames, len(est)
        # ... and the trajectory is metrically sane after scale alignment
        gt = synthetic.gt_trajectory(poses)
        rmse = evaluation.ate_rmse(est, gt, with_scale=True)
        assert rmse < 0.06, rmse
