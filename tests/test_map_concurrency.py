"""Concurrent map access soundness (SURVEY §2.3 P4): the async mapping
worker's BA write-backs must be atomic with respect to the tracker's locked
multi-array reads — observed data may only change together with a version
bump, and a locked local-view slice is internally consistent."""

import threading

import numpy as np

from orb_slam3_comments_ghr_tpu.ops import cameras
from tests.test_global_ba import _build_noisy_map

CAM = cameras.euroc_cam0()


class TestConcurrentMapAccess:
    def test_ba_writeback_is_atomic_with_version(self):
        m, mapper, kfs, _ = _build_noisy_map(seed=9, n_kf=16, n_pts=300)
        pts = m.local_point_ids(kfs, cap=10 ** 9)
        stop = threading.Event()
        errors: list[str] = []

        def writer():
            try:
                for _ in range(12):
                    mapper._run_ba(kfs, pts, iters=2, gauge_fix_first=True)
            finally:
                stop.set()

        def reader():
            kf_arr = np.asarray(kfs)
            while not stop.is_set():
                with m.lock:
                    v1 = m.version
                    R1 = m.kf_R[kf_arr].copy()
                    t1 = m.kf_t[kf_arr].copy()
                    p1 = m.mp_pos[pts].copy()
                # deliberately unlocked gap: the writer may commit here
                with m.lock:
                    if m.version == v1:
                        # same version => the store must be bit-identical
                        if not (np.array_equal(R1, m.kf_R[kf_arr])
                                and np.array_equal(t1, m.kf_t[kf_arr])
                                and np.array_equal(p1, m.mp_pos[pts])):
                            errors.append("data changed without version bump")
                            return

        w = threading.Thread(target=writer)
        rs = [threading.Thread(target=reader) for _ in range(2)]
        w.start()
        [r.start() for r in rs]
        w.join(timeout=300)
        [r.join(timeout=30) for r in rs]
        assert not w.is_alive()
        assert not errors, errors

    def test_full_speed_track_vs_map_no_torn_views(self):
        """Tracker-style local-view slicing races the mapper's full-map BA;
        every view must be self-consistent: the positions returned for `ids`
        must all belong to ONE committed version (checked via a per-version
        shadow checksum)."""
        m, mapper, kfs, _ = _build_noisy_map(seed=11, n_kf=16, n_pts=300)
        pts = m.local_point_ids(kfs, cap=10 ** 9)
        stop = threading.Event()
        snap_by_version = {}
        with m.lock:
            snap_by_version[m.version] = m.mp_pos[pts].copy()
        errors: list[str] = []

        def writer():
            try:
                for _ in range(6):
                    mapper.run_full_map_ba(list(kfs), pts, iters=2)
                    with m.lock:
                        snap_by_version[m.version] = m.mp_pos[pts].copy()
            finally:
                stop.set()

        def reader():
            while not stop.is_set():
                with m.lock:
                    v = m.version
                    view = m.mp_pos[pts].copy()
                ref = snap_by_version.get(v)
                if ref is not None and not np.array_equal(view, ref):
                    errors.append(f"torn view at version {v}")
                    return

        w = threading.Thread(target=writer)
        r = threading.Thread(target=reader)
        w.start(); r.start()
        w.join(timeout=300); r.join(timeout=30)
        assert not w.is_alive()
        assert not errors, errors
