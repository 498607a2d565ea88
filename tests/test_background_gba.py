"""Background global BA racing the pipeline (P3): the GBA runs on its own
transient thread (LoopClosing.cc:1669-1681), a newly-verified loop aborts it
at an LM-bite boundary (:1383-1407 mbStopGBA), and keyframes inserted while it
ran still receive the spanning-tree correction (:3109-3321). Tracking never
blocks on the mapping queue (mlNewKeyFrames is unbounded; backpressure is the
KeyframesInQueue probe in NeedNewKeyFrame, Tracking.cc:3904)."""

import threading
import time

import numpy as np

from orb_slam3_comments_ghr_tpu.ops import cameras
from orb_slam3_comments_ghr_tpu.pipeline.loopcloser import LoopCloser
from orb_slam3_comments_ghr_tpu.utils.config import SlamConfig
from test_global_ba import _build_noisy_map, _feats, _reproj_rmse

CAM = cameras.euroc_cam0()


def _make_loopcloser(m, mapper):
    cfg = SlamConfig(n_features=256, local_ba_points=512, async_mapping=True)
    return LoopCloser(CAM, cfg, m, kfdb=None, mapper=mapper)


def _stall_lm_bites(mapper, started: threading.Event, release: threading.Event):
    """Wrap the mapper's chunked LM step so the test can hold the GBA mid-run
    deterministically (the synthetic map solves in milliseconds otherwise)."""
    from orb_slam3_comments_ghr_tpu.optim import ba as ba_mod

    orig = ba_mod.bundle_adjust_resumable

    def stalled(*a, **k):
        started.set()
        release.wait(timeout=30)
        return orig(*a, **k)

    return ba_mod, orig, stalled


class TestBackgroundGBA:
    def test_runs_on_thread_and_tracker_side_work_continues(self):
        m, mapper, kfs, _ = _build_noisy_map(seed=7)
        lc = _make_loopcloser(m, mapper)
        e0 = _reproj_rmse(m, kfs)

        started, release = threading.Event(), threading.Event()
        ba_mod, orig, stalled = _stall_lm_bites(mapper, started, release)
        ba_mod.bundle_adjust_resumable = stalled
        try:
            lc._global_ba(iters=4)
            assert started.wait(timeout=30)
            assert lc.gba_running
            # "tracking" inserts a keyframe + point while the GBA holds the
            # device — must not block, and must be corrected afterwards
            par = kfs[-1]
            child = m.add_keyframe(
                m.kf_R[par].copy(), (m.kf_t[par] + [0.1, 0, 0]).copy(),
                _feats(), timestamp=99.0, parent=par,
            )
            rel_before = m.kf_R[child] @ m.kf_R[par].T
            trel_before = m.kf_t[child] - rel_before @ m.kf_t[par]
            release.set()
            lc.join_gba()
        finally:
            ba_mod.bundle_adjust_resumable = orig
            release.set()

        assert not lc.gba_running
        e1 = _reproj_rmse(m, kfs)
        assert e1 < e0, (e0, e1)
        # spanning-tree propagation kept the child rigidly attached
        rel_after = m.kf_R[child] @ m.kf_R[par].T
        trel_after = m.kf_t[child] - rel_after @ m.kf_t[par]
        np.testing.assert_allclose(rel_after, rel_before, atol=1e-4)
        np.testing.assert_allclose(trel_after, trel_before, atol=1e-4)

    def test_new_loop_aborts_running_gba(self):
        m, mapper, kfs, _ = _build_noisy_map(seed=9)
        lc = _make_loopcloser(m, mapper)

        started, release = threading.Event(), threading.Event()
        ba_mod, orig, stalled = _stall_lm_bites(mapper, started, release)
        ba_mod.bundle_adjust_resumable = stalled
        try:
            v0 = m.version
            lc._global_ba(iters=50)  # would run 25 bites if not aborted
            assert started.wait(timeout=30)
            t0 = time.monotonic()
            release.set()
            # what process_keyframe does when the next loop/merge verifies
            lc.abort_gba()
            took = time.monotonic() - t0
        finally:
            ba_mod.bundle_adjust_resumable = orig
            release.set()
        assert not lc.gba_running
        assert mapper.abort_gba  # the stop request reached the LM loop
        assert m.version > v0    # partial progress still wrote back
        assert took < 20.0       # stopped at a bite boundary, not after 25

    def test_tracker_map_queue_never_blocks(self):
        from orb_slam3_comments_ghr_tpu.system import SLAM

        cfg = SlamConfig(n_features=256, async_mapping=True)
        slam = SLAM(CAM, cfg)
        # the reference's mlNewKeyFrames is an unbounded list — tracking never
        # blocks in put(); backpressure is NeedNewKeyFrame's queue probe
        assert slam._map_queue.maxsize == 0
        assert slam.tracker.queue_probe is not None
