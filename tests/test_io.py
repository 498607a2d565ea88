"""Dataset loaders + CLI driver end-to-end on a synthetic EuRoC-layout
dataset."""

import json
import os

import numpy as np
import pytest

from orb_slam3_comments_ghr_tpu.io import datasets
from orb_slam3_comments_ghr_tpu.ops import cameras
from orb_slam3_comments_ghr_tpu.utils import synthetic

CAM = cameras.euroc_cam0()


@pytest.fixture(scope="module")
def euroc_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("euroc"))
    scene = synthetic.make_textured_scene(3)
    poses = synthetic.circular_trajectory(45)
    times = [1403636579.0 + i * 0.05 for i in range(45)]
    images = [synthetic.render_image(scene, CAM, R, t) for R, t in poses]
    imu = np.zeros((450, 7))
    imu[:, 0] = 1403636579.0 + np.arange(450) * 0.005
    imu[:, 3] = 9.81
    datasets.write_synthetic_euroc(root, images, times, imu_rows=imu)
    return root, poses, times


class TestEurocLoader:
    def test_loads_frames(self, euroc_root):
        root, poses, times = euroc_root
        ds = datasets.EurocDataset(root)
        assert len(ds) == 45
        frames = list(ds)
        assert frames[0].img.shape == (CAM.height, CAM.width)
        assert abs(frames[0].timestamp - times[0]) < 1e-6

    def test_imu_pairing(self, euroc_root):
        root, poses, times = euroc_root
        ds = datasets.EurocDataset(root, imu=True)
        frames = list(ds)
        # each frame (after the first) should carry ~10 samples at 200 Hz/20 Hz
        counts = [len(f.imu) for f in frames[1:6]]
        assert all(8 <= c <= 12 for c in counts), counts
        # gyro/accel column order: az column was 9.81 in the file -> col 3 (ax
        # slot in our layout is accel x; we wrote az=9.81 at accel z)
        assert abs(frames[1].imu[0, 3] - 9.81) < 1e-9


class TestCliDriver:
    def test_mono_run(self, euroc_root, tmp_path):
        root, poses, times = euroc_root
        out = str(tmp_path / "traj.txt")
        import contextlib, io as _io
        from orb_slam3_comments_ghr_tpu.io import run_slam

        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            run_slam.main(
                ["--dataset", "euroc", "--root", root, "--sensor", "mono",
                 "--out", out, "--n-features", "512"]
            )
        res = json.loads(buf.getvalue().strip().splitlines()[-1])
        assert res["frames"] == 45
        assert res["tracked"] > 15
        assert os.path.exists(out)
        lines = open(out).read().strip().splitlines()
        assert len(lines) > 15 and len(lines[0].split()) == 8
