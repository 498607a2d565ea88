"""Fisheye (Kannala-Brandt) support: undistortion and mono pipeline e2e."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam3_comments_ghr_tpu.ops import cameras
from orb_slam3_comments_ghr_tpu.system import SLAM
from orb_slam3_comments_ghr_tpu.utils import synthetic, evaluation
from orb_slam3_comments_ghr_tpu.utils.config import SlamConfig


def kb8_cam():
    return cameras.Camera(
        kind=cameras.KANNALA_BRANDT8,
        fx=380.0, fy=380.0, cx=376.0, cy=240.0,
        k1=0.01, k2=-0.002, k3=0.001, k4=-0.0005,
        width=752, height=480,
    )


class TestUndistortion:
    def test_roundtrip_to_pinhole(self):
        cam = kb8_cam()
        pin = cameras.pinhole_equivalent(cam)
        key = jax.random.PRNGKey(0)
        rays = jax.random.normal(key, (128, 3))
        rays = rays.at[:, 2].set(jnp.abs(rays[:, 2]) + 1.5)
        uv_fish = cameras.project(cam, rays)
        uv_un = cameras.undistort_points(cam, uv_fish)
        uv_pin = cameras.project(pin, rays)
        np.testing.assert_allclose(np.asarray(uv_un), np.asarray(uv_pin), atol=0.05)

    def test_pinhole_passthrough(self):
        cam = cameras.euroc_cam0()
        uv = jnp.array([[100.0, 100.0]])
        np.testing.assert_array_equal(
            np.asarray(cameras.undistort_points(cam, uv)), np.asarray(uv)
        )


class TestFisheyeMono:
    def test_e2e_kb8(self):
        """Synthetic features projected through the KB8 model; system
        undistorts and tracks with the virtual pinhole geometry."""
        cam = kb8_cam()
        world = synthetic.make_world(51, n_points=3000)
        poses = synthetic.circular_trajectory(40)
        cfg = SlamConfig(
            n_features=512, local_points_cap=2048, local_ba_points=2048,
            max_frames_between_kf=8, min_init_matches=60,
        )
        slam = SLAM(cam, cfg)
        est = []
        for i, (R, t) in enumerate(poses):
            feats, _ = synthetic.render_features(
                world, cam, R, t, n_feat=512, seed=7100 + i
            )
            # render_features projects with the KB8 model (cam arg) — these
            # are RAW fisheye pixel coords, as the real extractor would give
            feats = feats._replace(
                xy=cameras.undistort_points(cam, feats.xy)
            )
            pose = slam.track_features(feats, i * 0.05)
            if pose is not None:
                est.append((i * 0.05, pose))
        assert slam.state == "OK"
        assert len(est) > 30
        rmse = evaluation.ate_rmse(est, synthetic.gt_trajectory(poses), with_scale=True)
        assert rmse < 0.06, rmse
