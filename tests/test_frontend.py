import jax
import jax.numpy as jnp
import numpy as np

from orb_slam3_comments_ghr_tpu.frontend import extract, fast, pyramid, select, brief


def checkerboard(h=120, w=160, sq=12):
    """Grid of isolated bright squares — L-corners that FAST-9 fires on
    (unlike true checkerboard X-junctions, which have no 9-contiguous arc)."""
    y, x = np.mgrid[0:h, 0:w]
    img = np.where(((y // sq) % 2 == 0) & ((x // sq) % 2 == 0), 220.0, 20.0)
    return jnp.asarray(img, jnp.float32)


def random_texture(key, h=120, w=160):
    img = jax.random.uniform(key, (h, w)) * 255.0
    # smooth a bit so FAST has structure, not salt-and-pepper
    return pyramid.gaussian_blur(img, ksize=5, sigma=1.0)


class TestPyramid:
    def test_shapes(self):
        img = checkerboard()
        lv = pyramid.build_pyramid(img, 8, 1.2)
        assert len(lv) == 8
        assert lv[0].shape == (120, 160)
        for i in range(1, 8):
            assert lv[i].shape[0] < lv[i - 1].shape[0]

    def test_blur_preserves_mean(self):
        img = checkerboard()
        b = pyramid.gaussian_blur(img)
        assert b.shape == img.shape
        np.testing.assert_allclose(jnp.mean(b), jnp.mean(img), rtol=0.02)


class TestFast:
    def test_detects_checkerboard_corners(self):
        img = checkerboard()
        resp = fast.fast_response(img, 20.0)
        assert float(jnp.sum(resp > 0)) > 20  # many corners

    def test_flat_image_no_corners(self):
        img = jnp.full((64, 64), 100.0)
        resp = fast.fast_response(img, 7.0)
        assert float(jnp.sum(resp > 0)) == 0

    def test_nms_isolates_peaks(self):
        resp = jnp.zeros((32, 32)).at[10, 10].set(5.0).at[10, 11].set(3.0)
        out = fast.nms3(resp)
        assert out[10, 10] == 5.0 and out[10, 11] == 0.0

    def test_dual_threshold_fallback(self):
        # weak-contrast corner that fails t=20 but passes t=7
        img = jnp.full((70, 70), 100.0)
        img = img.at[30:40, 30:40].set(112.0)
        strong = fast.nms3(fast.fast_response(img, 20.0))
        combined = fast.dual_threshold_response(img, 20.0, 7.0)
        assert float(jnp.sum(strong > 0)) == 0
        assert float(jnp.sum(combined > 0)) > 0


class TestSelect:
    def test_quota_and_spread(self):
        img = checkerboard(240, 320)
        resp = fast.dual_threshold_response(img, 20.0, 7.0)
        xy, r, v = select.select_keypoints(resp, 100)
        assert xy.shape == (100, 2)
        n_valid = int(jnp.sum(v))
        assert n_valid > 30
        # spatial spread: selected points should span most of the image
        pts = np.asarray(xy[np.asarray(v)])
        assert pts[:, 0].max() - pts[:, 0].min() > 150
        assert pts[:, 1].max() - pts[:, 1].min() > 100

    def test_border_respected(self):
        img = checkerboard(240, 320)
        resp = fast.dual_threshold_response(img, 20.0, 7.0)
        xy, r, v = select.select_keypoints(resp, 200, border=19)
        pts = np.asarray(xy[np.asarray(v)])
        assert pts[:, 0].min() >= 19 and pts[:, 1].min() >= 19
        assert pts[:, 0].max() < 320 - 19 and pts[:, 1].max() < 240 - 19

    def test_level_quotas(self):
        q = select.level_quotas(1024, 8, 1.2)
        assert sum(q) == 1024
        assert q[0] > q[1] > q[-1] > 0


class TestBrief:
    def test_angle_of_gradient_patch(self):
        # intensity increasing along +x => centroid to the right => angle ~ 0
        x = jnp.arange(64, dtype=jnp.float32)
        img = jnp.tile(x, (64, 1))
        ang = brief.ic_angles(img, jnp.array([[32, 32]], jnp.int32))
        assert abs(float(ang[0])) < 0.1
        # along +y => angle ~ pi/2
        img_t = img.T
        ang2 = brief.ic_angles(img_t, jnp.array([[32, 32]], jnp.int32))
        assert abs(float(ang2[0]) - np.pi / 2) < 0.1

    def test_descriptor_rotation_invariance(self):
        """A rotated image patch should give a similar steered descriptor."""
        key = jax.random.PRNGKey(3)
        img = random_texture(key, 128, 128)
        # rotate image 90 degrees
        img_rot = jnp.rot90(img, k=-1)  # img[y, x] == img_rot[x, H-1-y]
        pt = jnp.array([[64, 64]], jnp.int32)
        pt_rot = jnp.array([[127 - 64, 64]], jnp.int32)
        a1 = brief.ic_angles(img, pt)
        a2 = brief.ic_angles(img_rot, pt_rot)
        d1 = brief.descriptors(img, pt, a1)
        d2 = brief.descriptors(img_rot, pt_rot, a2)
        dist = int(jnp.sum(jax.lax.population_count(d1 ^ d2)))
        assert dist < 85  # well below random (mean 128)

    def test_descriptor_distinctive(self):
        key = jax.random.PRNGKey(4)
        img = random_texture(key, 128, 128)
        pts = jnp.array([[40, 40], [80, 80]], jnp.int32)
        ang = brief.ic_angles(img, pts)
        d = brief.descriptors(img, pts, ang)
        dist = int(jnp.sum(jax.lax.population_count(d[0] ^ d[1])))
        assert dist > 60  # different patches -> far apart


class TestExtractor:
    def test_end_to_end(self):
        img = checkerboard(480, 640, 16)
        feats = extract(img, n_features=512)
        assert feats.xy.shape == (512, 2)
        assert feats.desc.shape == (512, 8)
        n_valid = int(jnp.sum(feats.valid))
        assert n_valid > 200
        # multiple levels populated
        lvls = np.asarray(feats.level[np.asarray(feats.valid)])
        assert len(np.unique(lvls)) >= 3

    def test_jit_cached(self):
        img = checkerboard(240, 320)
        f1 = extract(img, n_features=256)
        f2 = extract(img + 1.0, n_features=256)
        assert f1.xy.shape == f2.xy.shape
