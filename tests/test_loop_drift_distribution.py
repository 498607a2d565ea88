"""Essential-graph drift distribution: on a closed loop, keyframes FAR from
the loop edge must absorb a share of the accumulated drift (Optimizer.cc:4527
measures spanning-tree/covisibility edges from NonCorrectedSim3 poses, so the
drift lives in the residuals and is spread over the whole graph)."""

import numpy as np

from orb_slam3_comments_ghr_tpu.map.state import MapState, MapConfig
from orb_slam3_comments_ghr_tpu.ops import cameras
from orb_slam3_comments_ghr_tpu.pipeline.loopcloser import LoopCloser
from orb_slam3_comments_ghr_tpu.pipeline.mapper import LocalMapper
from orb_slam3_comments_ghr_tpu.utils.config import SlamConfig

CAM = cameras.euroc_cam0()


def _yaw(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


def _feats(n=8):
    return {
        "xy": np.zeros((n, 2), np.float32), "level": np.zeros(n, np.int32),
        "angle": np.zeros(n, np.float32), "desc": np.zeros((n, 8), np.uint32),
        "valid": np.ones(n, bool), "u_right": np.full(n, -1.0, np.float32),
        "depth": np.full(n, -1.0, np.float32),
    }


def _build_drifted_ring(n_kf=40, drift_per_step=0.004):
    """Ground-truth ring of poses; stored poses integrate the TRUE relative
    step composed with a small per-step yaw bias, so drift accumulates along
    the chain and the final KF is visibly off its ground-truth pose."""
    mc = MapConfig(max_kf=64, max_mp=512, n_feat=8, obs_cap=4)
    m = MapState(mc)

    gt_R, gt_t = [], []
    for k in range(n_kf):
        a = 2 * np.pi * k / n_kf
        R = _yaw(a)
        c = 3.0 * np.array([np.cos(a), np.sin(a), 0.0], np.float32)
        gt_R.append(R)
        gt_t.append((-R @ c).astype(np.float32))

    st_R, st_t = [gt_R[0]], [gt_t[0]]
    for k in range(1, n_kf):
        # true relative step with an injected yaw bias (odometry drift)
        R_rel = gt_R[k] @ gt_R[k - 1].T
        t_rel = gt_t[k] - R_rel @ gt_t[k - 1]
        R_rel = _yaw(drift_per_step) @ R_rel
        st_R.append((R_rel @ st_R[-1]).astype(np.float32))
        st_t.append((R_rel @ st_t[-1] + t_rel).astype(np.float32))

    ids = []
    for k in range(n_kf):
        kf = m.add_keyframe(st_R[k], st_t[k], _feats(), timestamp=0.1 * k,
                            parent=ids[-1] if ids else -1)
        ids.append(kf)
    # a handful of points anchored at each KF so the point-correction path
    # (grouped by reference KF) is exercised
    for k in range(0, n_kf, 4):
        p_cam = np.array([[0.3, -0.2, 4.0]], np.float32)
        p_w = (st_R[k].T @ (p_cam[0] - st_t[k]))[None]
        m.add_map_points(p_w, np.zeros((1, 8), np.uint32), ids[k],
                         np.array([0]))
    return m, ids, (gt_R, gt_t), (st_R, st_t)


class TestDriftDistribution:
    def test_far_keyframes_absorb_drift(self):
        m, ids, (gt_R, gt_t), (st_R, st_t) = _build_drifted_ring()
        n = len(ids)
        cfg = SlamConfig(n_features=8)
        mapper = LocalMapper(CAM, cfg, m)
        lc = LoopCloser(CAM, cfg, m, kfdb=None, mapper=mapper)

        # snapshot = the drifted state (what _correct_loop captures before
        # the window correction)
        pre_R = m.kf_R.copy()
        pre_t = m.kf_t.copy()

        # the "window correction": the loop-closing Sim3 puts the last KF at
        # its ground-truth pose (it re-observed the start of the ring)
        last, first = ids[-1], ids[0]
        m.kf_R[last] = gt_R[n - 1]
        m.kf_t[last] = gt_t[n - 1]

        # drift magnitude at the far end before the graph optimization
        mid = ids[n // 2]
        cam_center = lambda R, t: -R.T @ t
        drift_end = np.linalg.norm(
            cam_center(st_R[-1], st_t[-1]) - cam_center(gt_R[-1], gt_t[-1]))
        mid_err_before = np.linalg.norm(
            cam_center(m.kf_R[mid], m.kf_t[mid])
            - cam_center(gt_R[n // 2], gt_t[n // 2]))
        assert drift_end > 0.15  # the scenario has real drift to distribute
        p_mid = int(m.mp_ids()[len(m.mp_ids()) // 2])
        ref_mid = int(m.mp_first_kf[p_mid])
        p_cam_before = m.kf_R[ref_mid] @ m.mp_pos[p_mid] + m.kf_t[ref_mid]

        lc._optimize_essential_graph(last, first, pre_R, pre_t, pre_keys=None)

        # 1) keyframes far from the loop edge MOVED (drift distributed)
        moved_mid = np.linalg.norm(
            cam_center(m.kf_R[mid], m.kf_t[mid]) - cam_center(st_R[n // 2], st_t[n // 2]))
        assert moved_mid > 0.2 * drift_end, (moved_mid, drift_end)
        # 2) ...toward ground truth: mid-ring error shrinks substantially
        mid_err_after = np.linalg.norm(
            cam_center(m.kf_R[mid], m.kf_t[mid])
            - cam_center(gt_R[n // 2], gt_t[n // 2]))
        assert mid_err_after < 0.5 * mid_err_before, (mid_err_before, mid_err_after)
        # 3) whole-ring error shrinks on average
        errs_before, errs_after = [], []
        for k in range(n):
            errs_before.append(np.linalg.norm(
                cam_center(st_R[k], st_t[k]) - cam_center(gt_R[k], gt_t[k])))
            errs_after.append(np.linalg.norm(
                cam_center(m.kf_R[ids[k]], m.kf_t[ids[k]])
                - cam_center(gt_R[k], gt_t[k])))
        assert np.mean(errs_after) < 0.4 * np.mean(errs_before)
        # 4) map points rode along with their reference keyframe
        p_cam_after = m.kf_R[ref_mid] @ m.mp_pos[p_mid] + m.kf_t[ref_mid]
        np.testing.assert_allclose(p_cam_after, p_cam_before, atol=5e-2)


class TestDriftDistributionInertial4DoF:
    def test_dof4_graph_corrects_yaw_drift(self):
        """Inertial maps past VIBA2 use the 4-DoF (yaw+translation) essential
        graph (Optimizer.cc:4870). Pure yaw odometry drift is exactly its
        correctable subspace — the corrected ring must approach ground truth
        WITHOUT disturbing gravity (no roll/pitch introduced)."""
        from orb_slam3_comments_ghr_tpu.utils.config import IMU_STEREO

        m, ids, (gt_R, gt_t), (st_R, st_t) = _build_drifted_ring()
        n = len(ids)
        cfg = SlamConfig(sensor=IMU_STEREO, n_features=8)
        mapper = LocalMapper(CAM, cfg, m)
        lc = LoopCloser(CAM, cfg, m, kfdb=None, mapper=mapper)
        m.map_imu_init[m.active_map] = True
        m.map_viba1[m.active_map] = True
        m.map_viba2[m.active_map] = True  # -> dof4 graph
        # plausible world-frame velocities so the velocity-rotation path runs
        for k in ids:
            m.kf_vel[k] = np.array([0.1, 0.0, 0.0], np.float32)

        pre_R = m.kf_R.copy()
        pre_t = m.kf_t.copy()
        last, first = ids[-1], ids[0]
        m.kf_R[last] = gt_R[n - 1]
        m.kf_t[last] = gt_t[n - 1]

        cam_center = lambda R, t: -R.T @ t
        errs_before = [
            np.linalg.norm(cam_center(st_R[k], st_t[k])
                           - cam_center(gt_R[k], gt_t[k]))
            for k in range(n)
        ]
        lc._optimize_essential_graph(last, first, pre_R, pre_t, pre_keys=None)
        errs_after = [
            np.linalg.norm(cam_center(m.kf_R[ids[k]], m.kf_t[ids[k]])
                           - cam_center(gt_R[k], gt_t[k]))
            for k in range(n)
        ]
        assert np.mean(errs_after) < 0.4 * np.mean(errs_before), (
            np.mean(errs_before), np.mean(errs_after))
        # gravity preserved: corrected rotations keep world-z as rotation axis
        # (the ring is planar, so Rcw[2,2] must stay ~1)
        for k in range(0, n, 5):
            assert m.kf_R[ids[k]][2, 2] > 0.999, (k, m.kf_R[ids[k]])
