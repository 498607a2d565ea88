"""Packed single-round-trip device fetch (utils/fetch.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam3_comments_ghr_tpu.utils.fetch import device_fetch


class TestDeviceFetch:
    def test_round_trips_all_32bit_dtypes(self):
        rng = np.random.default_rng(0)
        tree = {
            "f32": jnp.asarray(rng.random((5, 7)).astype(np.float32)),
            "i32": jnp.asarray(
                rng.integers(-(2**31), 2**31 - 1, (3,), dtype=np.int32)
            ),
            "u32": jnp.asarray(
                rng.integers(0, 2**32 - 1, (4, 8), dtype=np.uint32)
            ),
            "bool": jnp.asarray(rng.random(9) > 0.5),
        }
        out = device_fetch(tree)
        for k, v in tree.items():
            ref = np.asarray(v)
            assert out[k].dtype == ref.dtype, k
            assert np.array_equal(out[k], ref), k

    def test_scalar_and_subword(self):
        tree = (jnp.float32(3.25), jnp.asarray([1, -2, 3], jnp.int8))
        a, b = device_fetch(tree)
        assert a == np.float32(3.25) and a.shape == ()
        assert b.dtype == np.int8 and np.array_equal(b, [1, -2, 3])

    def test_namedtuple_structure_preserved(self):
        from orb_slam3_comments_ghr_tpu.pipeline.programs import TrackResult

        r = TrackResult(
            R=jnp.eye(3),
            t=jnp.zeros(3),
            n_inliers=jnp.int32(5),
            visible=jnp.ones(4, bool),
            inlier=jnp.zeros(4, bool),
            match_feat=jnp.arange(4, dtype=jnp.int32),
        )
        out = device_fetch(r)
        assert isinstance(out, TrackResult)
        assert int(out.n_inliers) == 5
        assert np.array_equal(out.match_feat, [0, 1, 2, 3])

    def test_empty_tree(self):
        assert device_fetch({}) == {}

    def test_extreme_uint32_exact(self):
        # values near 2^32 would be corrupted by any float round trip
        v = jnp.asarray([0, 1, 2**32 - 1, 2**31], jnp.uint32)
        out = device_fetch((v,))[0]
        assert np.array_equal(out, np.asarray([0, 1, 2**32 - 1, 2**31], np.uint32))
