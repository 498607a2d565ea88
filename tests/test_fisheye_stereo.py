"""Non-rectified fisheye stereo: triangulated depths + metric tracking."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam3_comments_ghr_tpu.ops import cameras, lie
from orb_slam3_comments_ghr_tpu.pipeline import programs
from orb_slam3_comments_ghr_tpu.utils import synthetic


def kb8_pair():
    cam_l = cameras.Camera(
        kind=cameras.KANNALA_BRANDT8, fx=380.0, fy=380.0, cx=376.0, cy=240.0,
        k1=0.01, k2=-0.002, k3=0.001, k4=-0.0005, width=752, height=480,
    )
    cam_r = cameras.Camera(
        kind=cameras.KANNALA_BRANDT8, fx=382.0, fy=382.0, cx=370.0, cy=244.0,
        k1=0.012, k2=-0.001, k3=0.0008, k4=-0.0004, width=752, height=480,
    )
    R_lr = np.asarray(lie.so3_exp(jnp.array([0.0, 0.02, 0.0])), np.float32)
    t_lr = np.array([0.11, 0.001, -0.002], np.float32)  # ~11 cm baseline
    return cam_l, cam_r, R_lr, t_lr


class TestFisheyeStereoDepth:
    def test_recovers_metric_depth(self):
        cam_l, cam_r, R_lr, t_lr = kb8_pair()
        rng = np.random.default_rng(0)
        N = 512
        # world points in the LEFT camera frame
        uv_seed = rng.random((N, 2)).astype(np.float32) * [650, 420] + 50
        rays = np.asarray(cameras.unproject(cameras.pinhole_equivalent(cam_l),
                                            jnp.asarray(uv_seed)))
        z_true = (rng.random(N).astype(np.float32) * 6 + 3)
        X_l = rays * z_true[:, None]
        # right-frame coords: x_l = R_lr x_r + t_lr -> x_r = R_lr^T (x_l - t_lr)
        X_r = (X_l - t_lr) @ R_lr
        uv_l = np.asarray(cameras.project(cam_l, jnp.asarray(X_l)))
        uv_r = np.asarray(cameras.project(cam_r, jnp.asarray(X_r)))
        ok = (
            np.asarray(cameras.in_image(cam_l, jnp.asarray(uv_l), 8.0))
            & np.asarray(cameras.in_image(cam_r, jnp.asarray(uv_r), 8.0))
        )
        desc = rng.integers(0, 2**32, (N, 8), dtype=np.uint32)

        xy1 = cameras.undistort_points(cam_l, jnp.asarray(uv_l))
        xy2 = cameras.undistort_points(cam_r, jnp.asarray(uv_r))
        depth = programs.fisheye_stereo_depth(
            cameras.pinhole_equivalent(cam_l), cameras.pinhole_equivalent(cam_r),
            xy1, jnp.zeros(N, jnp.int32), jnp.asarray(desc), jnp.asarray(ok),
            xy2, jnp.zeros(N, jnp.int32), jnp.asarray(desc), jnp.asarray(ok),
            jnp.asarray(R_lr), jnp.asarray(t_lr),
        )
        d = np.asarray(depth)
        got = d > 0
        assert got.sum() > 0.8 * ok.sum()
        err = np.abs(d[got] - z_true[got]) / z_true[got]
        assert np.median(err) < 0.01, np.median(err)

    def test_no_matches_without_overlap(self):
        cam_l, cam_r, R_lr, t_lr = kb8_pair()
        rng = np.random.default_rng(1)
        N = 256
        xy = jnp.asarray(rng.random((N, 2)).astype(np.float32) * 400 + 100)
        # unrelated descriptors on both sides -> TH_LOW should reject
        d1 = jnp.asarray(rng.integers(0, 2**32, (N, 8), dtype=np.uint32))
        d2 = jnp.asarray(rng.integers(0, 2**32, (N, 8), dtype=np.uint32))
        depth = programs.fisheye_stereo_depth(
            cameras.pinhole_equivalent(cam_l), cameras.pinhole_equivalent(cam_r),
            xy, jnp.zeros(N, jnp.int32), d1, jnp.ones(N, bool),
            xy, jnp.zeros(N, jnp.int32), d2, jnp.ones(N, bool),
            jnp.asarray(R_lr), jnp.asarray(t_lr),
        )
        assert int((np.asarray(depth) > 0).sum()) < 10
