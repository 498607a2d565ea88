"""RGB-D end-to-end: depth-initialized map, metric scale without alignment."""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_comments_ghr_tpu.ops import cameras
from orb_slam3_comments_ghr_tpu.system import SLAM
from orb_slam3_comments_ghr_tpu.utils import synthetic, evaluation
from orb_slam3_comments_ghr_tpu.utils.config import SlamConfig, RGBD

CAM = cameras.euroc_cam0()


class TestRgbdPipeline:
    def test_e2e_rgbd_images(self):
        """Real extractor on rendered images + synthetic (exact) depth maps
        from the two-plane scene geometry."""
        scene = synthetic.make_textured_scene(61)
        poses = synthetic.circular_trajectory(40)
        cfg = SlamConfig(
            sensor=RGBD, n_features=768, local_points_cap=2048,
            local_ba_points=2048, max_frames_between_kf=8,
        )
        slam = SLAM(CAM, cfg)
        est = []
        for i, (R, t) in enumerate(poses):
            img = synthetic.render_image(scene, CAM, R, t)
            depth = _depth_map(scene, CAM, R, t)
            pose = slam.track_rgbd(img, depth, i * 0.05)
            if pose is not None:
                est.append((i * 0.05, pose))
        assert slam.state in ("OK", "RECENTLY_LOST")
        assert len(est) > 30
        gt = synthetic.gt_trajectory(poses)
        rmse = evaluation.ate_rmse(est, gt, with_scale=False)  # metric!
        assert rmse < 0.08, rmse


def _depth_map(scene, cam, R_cw, t_cw):
    """Exact per-pixel depth of the two-plane scene."""
    h, w = cam.height, cam.width
    u, v = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    rays_c = np.stack(
        [(u - cam.cx) / cam.fx, (v - cam.cy) / cam.fy, np.ones_like(u)], axis=-1
    )
    R_wc = R_cw.T
    c = -R_wc @ t_cw
    rays_w = rays_c @ R_wc.T

    def lam_for(zp):
        return (zp - c[2]) / rays_w[..., 2]

    lam_far = lam_for(scene.z_far)
    lam_near = lam_for(scene.z_near)
    X_near = c[None, None, :] + lam_near[..., None] * rays_w
    near_hit = (
        (np.abs(X_near[..., 0]) <= scene.near_extent)
        & (np.abs(X_near[..., 1]) <= scene.near_extent)
        & (lam_near > 0)
    )
    lam = np.where(near_hit & (lam_far > 0), lam_near, lam_far)
    depth = lam * rays_c[..., 2] * np.ones_like(lam)  # z-depth = lam (rays z=1)
    return np.where(lam > 0, lam, 0.0).astype(np.float32)
