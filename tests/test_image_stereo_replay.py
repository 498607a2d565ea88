"""Image-mode STEREO replay: real MH01 motion rendered to left+right views
and pushed through the full FAST/rBRIEF front end + rectified-stereo
matcher + tracker (the stereo analog of test_image_loopclosing's mono run;
reference: stereo_euroc.cc main loop + Frame stereo ctor Frame.cc:128).

Locks the `run_gt_replay.py --render images --sensor stereo` path in CI —
the right view is rendered at the rectified-baseline offset and depth comes
from the row-band stereo matcher, so metric scale must come out right
WITHOUT a scale fit (unlike mono image-mode, which drifts in scale)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_comments_ghr_tpu.ops import cameras
from orb_slam3_comments_ghr_tpu.system import SLAM
from orb_slam3_comments_ghr_tpu.utils import evaluation, gt_replay
from orb_slam3_comments_ghr_tpu.utils.config import SlamConfig, STEREO

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(gt_replay.GT_DIR, "MH01_GT.txt")),
    reason="reference EuRoC ground truth not mounted",
)

CAM = cameras.euroc_cam0()


def test_image_mode_stereo_tracks_metric():
    times, R_cw, t_cw, p_wc, q_wc = gt_replay.load_euroc_gt("MH01")
    n = 80  # hover + first translation: enough for stereo init + tracking
    scene = gt_replay.make_room_scene(11, p_wc[:n])
    cfg = SlamConfig(sensor=STEREO, n_features=640, min_init_matches=50,
                     max_frames_between_kf=10)
    slam = SLAM(CAM, cfg)
    b = float(CAM.bf) / float(CAM.fx)
    tracked = 0
    for i in range(n):
        img_l = gt_replay.render_room(scene, CAM, R_cw[i], t_cw[i])
        t_r = t_cw[i] - np.array([b, 0.0, 0.0], t_cw.dtype)
        img_r = gt_replay.render_room(scene, CAM, R_cw[i], t_r)
        pose = slam.track_stereo(jnp.asarray(img_l), jnp.asarray(img_r),
                                 float(times[i]))
        if pose is not None:
            tracked += 1
    assert tracked > 0.9 * n
    assert slam.map.n_maps == 1
    gt = gt_replay.gt_as_tum(times[:n], R_cw[:n], t_cw[:n])
    # METRIC ATE, no scale fit: the whole point of the stereo front end
    ate = evaluation.ate_rmse(slam.trajectory(), gt, with_scale=False)
    assert ate < 0.05, ate
