"""Replay of the reference's REAL EuRoC ground-truth trajectories (the
dataset-run validation culture of SURVEY.md §4, minus the images the
container doesn't have): real MH01 motion — real rotation rates and
accelerations at real timestamps — drives the full pipeline, and the
estimate is scored against the very ground-truth file the reference ships
(evaluation/Ground_truth/EuRoC_left_cam/MH01_GT.txt)."""

import os

import numpy as np
import pytest

from orb_slam3_comments_ghr_tpu.ops import cameras
from orb_slam3_comments_ghr_tpu.system import SLAM
from orb_slam3_comments_ghr_tpu.utils import evaluation, gt_replay, synthetic
from orb_slam3_comments_ghr_tpu.utils.config import SlamConfig

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(gt_replay.GT_DIR, "MH01_GT.txt")),
    reason="reference EuRoC ground truth not mounted",
)

CAM = cameras.euroc_cam0()


@pytest.fixture(scope="module")
def mh01_slice():
    times, R_cw, t_cw, p_wc, q_wc = gt_replay.load_euroc_gt("MH01")
    n = 240  # first 12 s: includes the hover + the first fast excursion
    world = gt_replay.make_hall_world(11, p_wc[:n], n_points=8000)
    cfg = SlamConfig(n_features=512, min_init_matches=50,
                     max_frames_between_kf=10)
    slam = SLAM(CAM, cfg)
    tracked = 0
    for i in range(n):
        feats, _ = synthetic.render_features(
            world, CAM, R_cw[i], t_cw[i], n_feat=512, seed=1000 + i)
        if slam.track_features(feats, float(times[i])) is not None:
            tracked += 1
    gt = gt_replay.gt_as_tum(times[:n], R_cw[:n], t_cw[:n])
    return slam, tracked, n, gt


class TestMH01Replay:
    def test_tracks_real_trajectory(self, mh01_slice):
        slam, tracked, n, gt = mh01_slice
        assert tracked > 0.9 * n
        assert slam.map.n_maps == 1  # never lost on the real motion profile

    def test_ate_against_reference_ground_truth(self, mh01_slice):
        slam, tracked, n, gt = mh01_slice
        ate = evaluation.ate_rmse(slam.trajectory(), gt, with_scale=True)
        # reference-grade accuracy on EuRoC is a few cm (BASELINE.md);
        # the feature-level replay removes extractor noise, so demand better
        assert ate < 0.05, ate


def test_gt_loader_roundtrip():
    times, R_cw, t_cw, p_wc, q_wc = gt_replay.load_euroc_gt("MH01")
    assert len(times) > 3000 and abs(times[1] - times[0] - 0.05) < 1e-3
    # rotations are orthonormal and t_cw inverts p_wc
    i = 100
    assert np.allclose(R_cw[i] @ R_cw[i].T, np.eye(3), atol=1e-5)
    assert np.allclose(-R_cw[i].T @ t_cw[i], p_wc[i], atol=1e-4)


def test_imu_synthesis_consistency():
    """Preintegrating the synthesized IMU between two GT poses must
    reproduce the GT relative rotation and (given GT velocities) the GT
    position change."""
    import jax.numpy as jnp
    from orb_slam3_comments_ghr_tpu.optim import imu as imu_mod

    times, R_cw, t_cw, p_wc, q_wc = gt_replay.load_euroc_gt("MH01")
    n = 400
    rows = gt_replay.synthesize_imu(times[:n], p_wc[:n], q_wc[:n])
    calib = imu_mod.ImuCalib(Rbc=jnp.eye(3), tbc=jnp.zeros(3),
                             noise_g=1e-4, noise_a=1e-3,
                             walk_g=1e-6, walk_a=1e-5)
    # window with real motion (the first seconds hover nearly still)
    i0, i1 = 300, 340  # 2 s window
    sel = (rows[:, 0] > times[i0]) & (rows[:, 0] <= times[i1])
    chunk = rows[sel]
    pre = imu_mod.preintegrate(
        jnp.asarray(chunk[:, 1:4], jnp.float32),
        jnp.asarray(chunk[:, 4:7], jnp.float32),
        jnp.asarray(np.diff(chunk[:, 0], prepend=times[i0]), jnp.float32),
        jnp.zeros(6, jnp.float32), calib,
    )
    R_wb0 = R_cw[i0].T
    R_wb1 = R_cw[i1].T
    dR_gt = R_wb0.T @ R_wb1
    assert np.abs(np.asarray(pre.dR) - dR_gt).max() < 0.02
    # position: p1 = p0 + v0 dT + 0.5 g dT^2 + Rwb0 dP
    dT = float(pre.dT)
    from scipy.interpolate import CubicSpline
    v0 = CubicSpline(times[:n], p_wc[:n], axis=0).derivative(1)(times[i0])
    g = np.array([0, 0, -gt_replay.GRAVITY])
    p1_pred = p_wc[i0] + v0 * dT + 0.5 * g * dT**2 + R_wb0 @ np.asarray(pre.dP)
    assert np.linalg.norm(p1_pred - p_wc[i1]) < 0.05
