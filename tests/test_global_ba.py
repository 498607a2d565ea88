"""Full-map global BA (mapper.run_full_map_ba): map-wide error reduction,
abort, and spanning-tree propagation to keyframes/points created while the
BA ran (RunGlobalBundleAdjustment, LoopClosing.cc:3067-3321)."""

import numpy as np
import jax.numpy as jnp

from orb_slam3_comments_ghr_tpu.map.state import MapState, MapConfig
from orb_slam3_comments_ghr_tpu.ops import cameras
from orb_slam3_comments_ghr_tpu.pipeline.mapper import LocalMapper
from orb_slam3_comments_ghr_tpu.utils.config import SlamConfig

CAM = cameras.euroc_cam0()


def _small_rot(rng, s):
    w = rng.normal(0, s, 3)
    th = np.linalg.norm(w) + 1e-12
    k = w / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return (np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K).astype(np.float32)


def _feats(n=256):
    return {
        "xy": np.zeros((n, 2), np.float32), "level": np.zeros(n, np.int32),
        "angle": np.zeros(n, np.float32), "desc": np.zeros((n, 8), np.uint32),
        "valid": np.ones(n, bool), "u_right": np.full(n, -1.0, np.float32),
        "depth": np.full(n, -1.0, np.float32),
    }


def _build_noisy_map(seed=0, n_kf=24, n_pts=700, noise_px=0.3, pose_noise=0.02):
    """A weaving line of keyframes observing a point cloud, with pose/point
    noise so BA has real error to remove. Returns (map, mapper, kf ids, gt)."""
    rng = np.random.default_rng(seed)
    mc = MapConfig(max_kf=64, max_mp=4096, n_feat=256, obs_cap=8)
    cfg = SlamConfig(n_features=256, local_ba_points=512)
    m = MapState(mc)
    mapper = LocalMapper(CAM, cfg, m)

    pts_gt = rng.uniform([-4, -3, 6], [4, 3, 14], (n_pts, 3)).astype(np.float32)
    desc = rng.integers(0, 2 ** 32, (n_pts, 8), dtype=np.uint32)
    Rs_gt, ts_gt = [], []

    kf_ids = []
    for k in range(n_kf):
        ang = 0.3 * np.sin(2 * np.pi * k / n_kf)
        c, s = np.cos(ang), np.sin(ang)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        t = np.array([0.08 * k - 1.0, 0.02 * k, 0.0], np.float32)
        Rs_gt.append(R); ts_gt.append(t)
        # noisy stored pose (except the anchor)
        dR = _small_rot(rng, 0 if k == 0 else pose_noise)
        Rn = (dR @ R).astype(np.float32)
        tn = (t + (0 if k == 0 else rng.normal(0, pose_noise, 3))).astype(np.float32)
        kf = m.add_keyframe(Rn, tn, _feats(), timestamp=k * 0.5,
                            parent=kf_ids[-1] if kf_ids else -1)
        kf_ids.append(kf)

    # points + observations (subsample per KF so obs_cap holds)
    slot_ctr = {k: 0 for k in kf_ids}
    for j in range(n_pts):
        obs_kfs = rng.choice(n_kf, size=4, replace=False)
        first = int(min(obs_kfs))
        p_noisy = pts_gt[j] + rng.normal(0, 0.05, 3).astype(np.float32)
        kf0 = kf_ids[first]
        slot0 = slot_ctr[kf0]
        if slot0 >= 250:
            continue
        uv0 = np.asarray(cameras.project(
            CAM, jnp.asarray((Rs_gt[first] @ pts_gt[j] + ts_gt[first])[None]))[0])
        m.kf_feat_xy[kf0, slot0] = uv0 + rng.normal(0, noise_px, 2)
        mp = m.add_map_points(p_noisy[None], desc[j][None], kf0,
                              np.array([slot0]))[0]
        slot_ctr[kf0] = slot0 + 1
        for k in obs_kfs:
            kf = kf_ids[int(k)]
            if kf == kf0:
                continue
            pc = Rs_gt[k] @ pts_gt[j] + ts_gt[k]
            if pc[2] < 0.5:
                continue
            uv = np.asarray(cameras.project(CAM, jnp.asarray(pc[None]))[0])
            uv = uv + rng.normal(0, noise_px, 2)
            if not (0 <= uv[0] < CAM.width and 0 <= uv[1] < CAM.height):
                continue
            slot = slot_ctr[kf]
            if slot >= 250:
                continue
            m.kf_feat_xy[kf, slot] = uv
            m.add_observation(int(mp), kf, slot)
            slot_ctr[kf] = slot + 1
    return m, mapper, kf_ids, (Rs_gt, ts_gt, pts_gt)


def _reproj_rmse(m, kfs):
    errs = []
    for kf in kfs:
        mids = m.kf_feat_mp[kf]
        sel = np.nonzero(mids >= 0)[0]
        if not len(sel):
            continue
        p = m.mp_pos[mids[sel]]
        pc = p @ m.kf_R[kf].T + m.kf_t[kf]
        uv = np.asarray(cameras.project(CAM, jnp.asarray(pc)))
        errs.append(np.linalg.norm(uv - m.kf_feat_xy[kf, sel], axis=-1))
    e = np.concatenate(errs)
    return float(np.sqrt(np.mean(e ** 2)))


class TestFullMapBA:
    def test_error_drops_map_wide(self):
        m, mapper, kfs, _ = _build_noisy_map()
        e0 = _reproj_rmse(m, kfs)
        pts = m.local_point_ids(kfs, cap=10 ** 9)
        mapper.run_full_map_ba(kfs, pts, iters=10)
        e1 = _reproj_rmse(m, kfs)
        assert e1 < 0.35 * e0, (e0, e1)

    def test_propagates_to_kfs_created_during_ba(self):
        m, mapper, kfs, _ = _build_noisy_map(seed=3)
        snapshot = list(kfs)
        pts = m.local_point_ids(snapshot, cap=10 ** 9)
        # simulate tracking inserting a KF while the BA runs: child of the
        # last snapshot KF, plus a point first-observed from it
        par = snapshot[-1]
        Rn, tn = m.kf_R[par].copy(), (m.kf_t[par] + [0.1, 0, 0]).copy()
        child = m.add_keyframe(Rn, tn, _feats(), timestamp=99.0, parent=par)
        p_new = m.add_map_points(
            np.array([[0.5, 0.5, 8.0]], np.float32),
            np.zeros((1, 8), np.uint32), child, np.array([0]))[0]
        rel_before = m.kf_R[child] @ m.kf_R[par].T
        trel_before = m.kf_t[child] - rel_before @ m.kf_t[par]
        p_cam_before = m.kf_R[child] @ m.mp_pos[p_new] + m.kf_t[child]

        mapper.run_full_map_ba(snapshot, pts, iters=6)

        # relative child->parent transform preserved exactly
        rel_after = m.kf_R[child] @ m.kf_R[par].T
        trel_after = m.kf_t[child] - rel_after @ m.kf_t[par]
        np.testing.assert_allclose(rel_after, rel_before, atol=1e-4)
        np.testing.assert_allclose(trel_after, trel_before, atol=1e-4)
        # the new point moved WITH its reference keyframe
        p_cam_after = m.kf_R[child] @ m.mp_pos[p_new] + m.kf_t[child]
        np.testing.assert_allclose(p_cam_after, p_cam_before, atol=1e-3)

    def test_abort_stops_early_but_writes_back(self):
        m, mapper, kfs, _ = _build_noisy_map(seed=5)
        pts = m.local_point_ids(kfs, cap=10 ** 9)
        e0 = _reproj_rmse(m, kfs)
        v0 = m.version
        mapper.request_abort_gba()
        # abort flag is honored at the first bite boundary -> 2 LM iters max
        mapper.run_full_map_ba(kfs, pts, iters=10)
        assert m.version > v0  # still wrote back a consistent state
        e1 = _reproj_rmse(m, kfs)
        assert e1 <= e0 * 1.05
