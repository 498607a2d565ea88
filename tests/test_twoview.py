import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_comments_ghr_tpu.ops import lie, cameras, triangulate
from orb_slam3_comments_ghr_tpu.optim import twoview

CAM = cameras.euroc_cam0()


def two_view_scene(key, n=300, planar=False, baseline=0.3, noise=0.5, outliers=0.0):
    """Synthetic matched pixel pairs between two views with known motion.

    Returns uv1, uv2, valid, (R_gt, t_gt dir), pts (cam1 frame)."""
    kp, kz, kn, ko = jax.random.split(key, 4)
    uv = jax.random.uniform(kp, (n, 2)) * jnp.array([CAM.width - 40.0, CAM.height - 40.0]) + 20.0
    rays = cameras.unproject(CAM, uv)
    if planar:
        # all points on the z = 8 plane
        z = 8.0 / rays[:, 2:3]
    else:
        z = jax.random.uniform(kz, (n, 1)) * 8.0 + 4.0
    pts = rays * z
    # cam2: translated along x with slight rotation
    R_gt = lie.so3_exp(jnp.array([0.01, 0.03, 0.005]))
    t_gt = jnp.array([-baseline, 0.02, 0.01])
    pts2 = (R_gt @ pts.T).T + t_gt
    uv1 = cameras.project(CAM, pts) + jax.random.normal(kn, (n, 2)) * noise
    uv2 = cameras.project(CAM, pts2) + jax.random.normal(jax.random.fold_in(kn, 1), (n, 2)) * noise
    valid = (
        cameras.in_image(CAM, uv1, 5.0)
        & cameras.in_image(CAM, uv2, 5.0)
        & (pts2[:, 2] > 0.1)
    )
    if outliers > 0:
        bad = jax.random.uniform(ko, (n,)) < outliers
        uv2 = jnp.where(bad[:, None], jax.random.uniform(ko, (n, 2)) * 400 + 30, uv2)
    return uv1, uv2, valid, (R_gt, t_gt), pts


def check_motion(res, R_gt, t_gt, atol_rot=0.02, atol_dir=0.05):
    assert bool(res.success)
    rot_err = float(jnp.linalg.norm(lie.so3_log(res.R @ R_gt.T)))
    assert rot_err < atol_rot, rot_err
    t_dir_gt = t_gt / jnp.linalg.norm(t_gt)
    cos = float(jnp.abs(jnp.dot(res.t, t_dir_gt)))
    assert cos > 1 - atol_dir, cos


class TestTwoView:
    def test_general_scene(self):
        uv1, uv2, valid, (Rg, tg), pts = two_view_scene(jax.random.PRNGKey(0))
        res = twoview.reconstruct(CAM, uv1, uv2, valid, jax.random.PRNGKey(42))
        check_motion(res, Rg, tg)
        assert int(res.good.sum()) > 100
        # triangulated depths should match ground truth up to global scale
        good = np.asarray(res.good)
        scale = np.median(np.asarray(pts)[good, 2] / np.asarray(res.points)[good, 2])
        err = np.abs(np.asarray(res.points)[good] * scale - np.asarray(pts)[good])
        assert np.median(err) < 0.2

    def test_planar_scene_uses_homography(self):
        uv1, uv2, valid, (Rg, tg), pts = two_view_scene(jax.random.PRNGKey(1), planar=True)
        res = twoview.reconstruct(CAM, uv1, uv2, valid, jax.random.PRNGKey(43))
        assert bool(res.used_homography)
        check_motion(res, Rg, tg, atol_rot=0.03)

    def test_with_outliers(self):
        uv1, uv2, valid, (Rg, tg), pts = two_view_scene(
            jax.random.PRNGKey(2), outliers=0.25
        )
        res = twoview.reconstruct(CAM, uv1, uv2, valid, jax.random.PRNGKey(44))
        check_motion(res, Rg, tg, atol_rot=0.03)

    def test_pure_rotation_fails(self):
        """No parallax -> reconstruction must report failure (the ref rejects
        via parallax check)."""
        uv1, uv2, valid, (Rg, tg), pts = two_view_scene(
            jax.random.PRNGKey(3), baseline=0.0, noise=0.3
        )
        res = twoview.reconstruct(CAM, uv1, uv2, valid, jax.random.PRNGKey(45))
        assert not bool(res.success)


class TestTriangulate:
    def test_exact(self):
        key = jax.random.PRNGKey(5)
        pts = jax.random.uniform(key, (64, 3)) * jnp.array([4, 3, 6]) + jnp.array([-2, -1.5, 4])
        R = lie.so3_exp(jnp.array([0.0, 0.1, 0.0]))
        t = jnp.array([-0.5, 0.0, 0.0])
        P1 = triangulate.projection_matrix(CAM.K, jnp.eye(3), jnp.zeros(3))
        P2 = triangulate.projection_matrix(CAM.K, R, t)
        uv1 = cameras.project(CAM, pts)
        pts2 = (R @ pts.T).T + t
        uv2 = cameras.project(CAM, pts2)
        X = triangulate.triangulate(P1, P2, uv1, uv2)
        np.testing.assert_allclose(np.asarray(X), np.asarray(pts), atol=1e-2)
