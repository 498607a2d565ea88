"""Batched observation insertion + vectorized covisibility must match the
one-at-a-time semantics (map/state.py)."""

import numpy as np

from orb_slam3_comments_ghr_tpu.map.state import MapState, MapConfig


def _feats(rng, n=64):
    return {
        "xy": rng.random((n, 2)).astype(np.float32),
        "level": np.zeros(n, np.int32),
        "angle": np.zeros(n, np.float32),
        "desc": rng.integers(0, 2**32, (n, 8), dtype=np.uint32),
        "valid": np.ones(n, bool),
        "u_right": -np.ones(n, np.float32),
        "depth": -np.ones(n, np.float32),
    }


def _state(rng, n_kf=6, n_mp=40):
    cfg = MapConfig(n_feat=64, max_kf=20, max_mp=500, obs_cap=8)
    st = MapState(cfg)
    f = _feats(rng)
    for k in range(n_kf):
        st.add_keyframe(np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
                        f, float(k))
    st.add_map_points(rng.random((n_mp, 3)).astype(np.float32),
                      rng.integers(0, 2**32, (n_mp, 8), dtype=np.uint32),
                      0, np.arange(n_mp))
    return st


class TestBatchedObservations:
    def test_matches_sequential_adds(self):
        rng = np.random.default_rng(0)
        a, b = _state(rng), _state(np.random.default_rng(0))
        for trial in range(100):
            kf = int(rng.integers(0, 6))
            n = int(rng.integers(1, 12))
            mps = rng.choice(40, n, replace=False)
            fi = rng.choice(64, n, replace=False)
            a.add_observations(mps, kf, fi)
            for m_, f_ in zip(mps, fi):
                b.add_observation(int(m_), kf, int(f_))
        for name in ("mp_obs_kf", "mp_obs_idx", "mp_n_obs", "kf_feat_mp"):
            assert (getattr(a, name) == getattr(b, name)).all(), name

    def test_skips_existing_and_full(self):
        rng = np.random.default_rng(1)
        st = _state(rng)
        added = st.add_observations(np.array([0, 1]), 2, np.array([5, 6]))
        assert added.all()
        again = st.add_observations(np.array([0, 1]), 2, np.array([7, 8]))
        assert not again.any()  # already observing kf 2
        # fill point 3's slots completely (obs_cap=8; slot 0 = kf 0 already)
        for k in range(1, 6):
            st.add_observation(3, k, k)
        st.mp_obs_kf[3, st.mp_obs_kf[3] < 0] = 19  # saturate remaining slots
        full = st.add_observations(np.array([3]), 7, np.array([9]))
        assert not full.any()

    def test_version_bumps_on_add(self):
        rng = np.random.default_rng(2)
        st = _state(rng)
        v0 = st.version
        st.add_observations(np.array([10]), 3, np.array([11]))
        assert st.version > v0
        v1 = st.version
        st.add_observations(np.array([10]), 3, np.array([12]))  # no-op
        assert st.version == v1


class TestCovisibility:
    def test_tie_break_prefers_newer_kf(self):
        rng = np.random.default_rng(3)
        st = _state(rng)
        # kf 0 and kf 1..3 each share exactly 2 points with kf 5
        for kf, mps in ((1, [0, 1]), (2, [2, 3]), (3, [4, 5])):
            for i, mp in enumerate(mps):
                st.add_observation(mp, kf, 20 + i)
                st.add_observation(mp, 5, 30 + mp)
        out = st.covisible_kfs(5, k=10, min_weight=1)
        # kf 0 observes everything (first_kf of all points) so it wins;
        # among the weight-2 ties, newer keyframes come first
        tied = [k for k in out if k in (1, 2, 3)]
        assert tied == [3, 2, 1]

    def test_counts_match_bruteforce(self):
        rng = np.random.default_rng(4)
        st = _state(rng)
        for _ in range(200):
            st.add_observation(int(rng.integers(0, 40)),
                               int(rng.integers(0, 6)),
                               int(rng.integers(0, 64)))
        for kf in range(6):
            counts = {}
            mps = st.kf_feat_mp[kf]
            for other in st.mp_obs_kf[mps[mps >= 0]].reshape(-1):
                if other >= 0 and other != kf:
                    counts[int(other)] = counts.get(int(other), 0) + 1
            assert st.covisibility(kf) == counts
