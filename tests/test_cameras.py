import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_comments_ghr_tpu.ops import cameras


def _kb8():
    # TUM-VI style fisheye intrinsics
    return cameras.Camera(
        kind=cameras.KANNALA_BRANDT8,
        fx=190.978, fy=190.973, cx=254.931, cy=256.897,
        k1=0.00348238, k2=0.000715034, k3=-0.00205323, k4=0.000202936,
        width=512, height=512,
    )


class TestPinhole:
    def setup_method(self):
        self.cam = cameras.euroc_cam0()

    def test_project_unproject(self):
        key = jax.random.PRNGKey(0)
        uv = jax.random.uniform(key, (128, 2)) * jnp.array([752.0, 480.0])
        ray = cameras.unproject(self.cam, uv)
        depth = jax.random.uniform(jax.random.fold_in(key, 1), (128, 1)) * 10 + 0.5
        uv2 = cameras.project(self.cam, ray * depth)
        np.testing.assert_allclose(uv2, uv, atol=1e-3)

    def test_jacobian_matches_autodiff(self):
        pc = jnp.array([0.3, -0.2, 2.5])
        J = cameras.project_jac(self.cam, pc)
        J_ad = jax.jacfwd(lambda p: cameras.project(self.cam, p))(pc)
        np.testing.assert_allclose(J, J_ad, atol=1e-4)

    def test_in_image(self):
        uv = jnp.array([[10.0, 10.0], [-1.0, 5.0], [751.0, 479.0], [752.0, 100.0]])
        np.testing.assert_array_equal(
            cameras.in_image(self.cam, uv), jnp.array([True, False, True, False])
        )


class TestKB8:
    def setup_method(self):
        self.cam = _kb8()

    def test_project_unproject(self):
        key = jax.random.PRNGKey(1)
        # points within ~60 deg of axis
        dirs = jax.random.normal(key, (128, 3))
        dirs = dirs.at[:, 2].set(jnp.abs(dirs[:, 2]) + 1.2)
        uv = cameras.project(self.cam, dirs)
        ray = cameras.unproject(self.cam, uv)
        uv2 = cameras.project(self.cam, ray)
        np.testing.assert_allclose(uv2, uv, atol=1e-2)

    def test_jacobian_matches_autodiff(self):
        pc = jnp.array([[0.3, -0.2, 1.5], [0.0, 0.0, 2.0]])
        J = cameras.project_jac(self.cam, pc)
        J_ad = jax.vmap(jax.jacfwd(lambda p: cameras.project(self.cam, p)))(pc)
        np.testing.assert_allclose(J, J_ad, atol=1e-4)

    def test_wide_angle(self):
        # fisheye should map a ~70-degree ray inside the image
        pc = jnp.array([1.0, 0.0, 0.36])
        uv = cameras.project(self.cam, pc)
        assert bool(cameras.in_image(self.cam, uv))
