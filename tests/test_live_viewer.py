"""Live HTTP viewer (utils.live_viewer): the Pangolin Viewer analog.

Runs a short synthetic mono sequence, serves the viewer, and exercises every
endpoint over a real HTTP connection: state JSON, frame/map PNG renders, and
the menu commands (localization toggle, reset) — Viewer.cc:163-200 behavior.
"""

import json
import urllib.request

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_comments_ghr_tpu.ops import cameras
from orb_slam3_comments_ghr_tpu.system import SLAM
from orb_slam3_comments_ghr_tpu.utils import synthetic
from orb_slam3_comments_ghr_tpu.utils.config import SlamConfig
from orb_slam3_comments_ghr_tpu.utils.live_viewer import LiveViewer


@pytest.fixture(scope="module")
def slam_with_viewer():
    cam = cameras.euroc_cam0()
    cfg = SlamConfig(n_features=1024, min_init_matches=60,
                     local_points_cap=2048, local_ba_points=1024,
                     max_frames_between_kf=8, async_mapping=False)
    scene = synthetic.make_textured_scene(7)
    poses = synthetic.circular_trajectory(24)
    slam = SLAM(cam, cfg)
    viewer = LiveViewer(slam, port=0)  # bind any free port
    port = viewer.start()
    img = None
    for i, (R, t) in enumerate(poses):
        img = synthetic.render_image(scene, cam, R, t)
        slam.track_monocular(jnp.asarray(img), i * 0.05)
        viewer.publish(img)
    yield slam, viewer, port
    viewer.stop()


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}",
                                timeout=10) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def test_index_page(slam_with_viewer):
    _, viewer, port = slam_with_viewer
    code, ctype, body = _get(port, "/")
    assert code == 200 and "text/html" in ctype
    assert b"live viewer" in body


def test_state_json(slam_with_viewer):
    slam, viewer, port = slam_with_viewer
    code, ctype, body = _get(port, "/state.json")
    assert code == 200 and "json" in ctype
    s = json.loads(body)
    assert s["frames_published"] == 24
    assert s["keyframes"] == slam.n_keyframes() > 0
    assert s["map_points"] == slam.n_map_points() > 0
    assert s["state"] in ("OK", "RECENTLY_LOST", "NOT_INITIALIZED")
    assert s["pose_Tcw_3x4"] is None or len(s["pose_Tcw_3x4"]) == 12


def test_frame_and_map_png(slam_with_viewer):
    _, viewer, port = slam_with_viewer
    for path in ("/frame.png", "/map.png"):
        code, ctype, body = _get(port, path)
        assert code == 200 and ctype == "image/png"
        assert body[:8] == b"\x89PNG\r\n\x1a\n"
        # decodes to a real image
        import io

        from PIL import Image

        im = Image.open(io.BytesIO(body))
        assert im.size[0] > 10 and im.size[1] > 10


def test_menu_commands(slam_with_viewer):
    slam, viewer, port = slam_with_viewer
    code, _, _ = _get(port, "/cmd?op=localization_on")
    assert code == 200
    assert slam.tracker.localization_only
    _get(port, "/cmd?op=localization_off")
    assert not slam.tracker.localization_only


def test_unknown_path_404(slam_with_viewer):
    _, viewer, port = slam_with_viewer
    import urllib.error

    with pytest.raises(urllib.error.HTTPError):
        _get(port, "/nope")
