"""Stereo matching kernel + stereo/RGB-D end-to-end pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_comments_ghr_tpu.ops import cameras
from orb_slam3_comments_ghr_tpu.frontend import extract, stereo
from orb_slam3_comments_ghr_tpu.system import SLAM
from orb_slam3_comments_ghr_tpu.utils import synthetic, evaluation
from orb_slam3_comments_ghr_tpu.utils.config import SlamConfig, STEREO

CAM = cameras.euroc_cam0()


class TestStereoMatch:
    def test_known_disparity(self):
        """Right image = left shifted by a constant disparity."""
        scene = synthetic.make_textured_scene(11)
        poses = synthetic.circular_trajectory(4)
        img_l = synthetic.render_image(scene, CAM, *poses[0])
        d = 12  # pixels
        img_r = np.roll(img_l, -d, axis=1)
        fl = extract(jnp.asarray(img_l), n_features=512)
        fr = extract(jnp.asarray(img_r), n_features=512)
        ur, depth = stereo.stereo_match(
            CAM, fl, fr, jnp.asarray(img_l), jnp.asarray(img_r)
        )
        ok = np.asarray(ur) > 0
        assert ok.sum() > 100
        disp = np.asarray(fl.xy)[:, 0][ok] - np.asarray(ur)[ok]
        med = np.median(disp)
        assert abs(med - d) < 0.75, med
        # depth consistent with bf/disparity
        z = np.asarray(depth)[ok]
        np.testing.assert_allclose(np.median(z), CAM.bf / d, rtol=0.1)

    def test_rgbd_conversion(self):
        scene = synthetic.make_textured_scene(12)
        poses = synthetic.circular_trajectory(4)
        img = synthetic.render_image(scene, CAM, *poses[0])
        f = extract(jnp.asarray(img), n_features=256)
        depth_map = jnp.full((CAM.height, CAM.width), 5.0)
        ur, depth = stereo.depth_to_stereo(CAM, f, depth_map)
        ok = np.asarray(f.valid)
        np.testing.assert_allclose(np.asarray(depth)[ok], 5.0, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(f.xy)[ok, 0] - np.asarray(ur)[ok], CAM.bf / 5.0, atol=1e-3
        )


class TestStereoPipeline:
    def test_e2e_stereo_features(self):
        """Stereo SLAM on synthetic features: metric scale (no Horn scale
        fit) must be recovered from depth."""
        world = synthetic.make_world(21, n_points=3000)
        poses = synthetic.circular_trajectory(30)
        cfg = SlamConfig(
            sensor=STEREO, n_features=512, local_points_cap=2048,
            local_ba_points=2048, max_frames_between_kf=8,
        )
        slam = SLAM(CAM, cfg)
        est = []
        for i, (R, t) in enumerate(poses):
            feats, _ = synthetic.render_features(
                world, CAM, R, t, n_feat=512, seed=900 + i, stereo=True
            )
            pose = slam.track_features(feats, i * 0.05)
            if pose is not None:
                est.append((i * 0.05, pose))
        assert slam.state == "OK"
        assert len(est) >= 28
        gt = synthetic.gt_trajectory(poses)
        rmse = evaluation.ate_rmse(est, gt, with_scale=False)  # metric!
        assert rmse < 0.06, rmse
