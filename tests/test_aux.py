"""Auxiliary subsystems: profiling, verbose, viz, YAML settings, native IO."""

import os

import numpy as np
import pytest


class TestProfiling:
    def test_stage_timer(self, capsys):
        from orb_slam3_comments_ghr_tpu.utils.profiling import StageTimer

        t = StageTimer()
        with t.stage("extract"):
            sum(range(1000))
        with t.stage("extract"):
            pass
        with t.stage("local_ba"):
            pass
        s = t.stats()
        assert s["extract"]["n"] == 2
        assert s["extract"]["mean_ms"] >= 0
        t.print_time_stats()
        out = capsys.readouterr().out
        assert "extract" in out and "local_ba" in out


class TestYamlSettings:
    def test_reference_style_yaml(self, tmp_path):
        from orb_slam3_comments_ghr_tpu.io.config_yaml import load_settings
        from orb_slam3_comments_ghr_tpu.utils.config import IMU_MONOCULAR

        p = tmp_path / "settings.yaml"
        p.write_text(
            "%YAML:1.0\n"
            'Camera.type: "PinHole"\n'
            "Camera.fx: 458.654\nCamera.fy: 457.296\n"
            "Camera.cx: 367.215\nCamera.cy: 248.375\n"
            "Camera.width: 752\nCamera.height: 480\nCamera.fps: 20.0\n"
            "ORBextractor.nFeatures: 1200\nORBextractor.scaleFactor: 1.2\n"
            "ORBextractor.nLevels: 8\n"
            "IMU.NoiseGyro: 1.7e-4\nIMU.NoiseAcc: 2.0e-3\n"
            "IMU.GyroWalk: 1.9e-5\nIMU.AccWalk: 3.0e-3\nIMU.Frequency: 200\n"
        )
        cam, cfg, calib = load_settings(str(p), sensor=IMU_MONOCULAR)
        assert abs(cam.fx - 458.654) < 1e-6
        assert cfg.n_features == 1200
        assert cfg.max_frames_between_kf == 20
        assert calib is not None and calib.noise_g > 0

    def test_v1_imu_extrinsics_and_stereo_baseline(self, tmp_path):
        """ADVICE round-1 regressions: IMU.T_b_c1 must populate Rbc/tbc (the
        EuRoC cam-IMU rotation is ~90 deg, not identity), Stereo.b (meters)
        must become bf = b*fx, and bias random-walk sigmas divide by
        sqrt(freq) (Settings.cc conventions)."""
        import numpy as np
        from orb_slam3_comments_ghr_tpu.io.config_yaml import load_settings
        from orb_slam3_comments_ghr_tpu.utils.config import IMU_STEREO

        p = tmp_path / "v1.yaml"
        p.write_text(
            "%YAML:1.0\n"
            'File.version: "1.0"\n'
            'Camera.type: "Rectified"\n'
            "Camera1.fx: 450.0\nCamera1.fy: 450.0\n"
            "Camera1.cx: 367.0\nCamera1.cy: 248.0\n"
            "Camera.width: 752\nCamera.height: 480\nCamera.fps: 20\n"
            "Stereo.b: 0.11\n"
            "IMU.NoiseGyro: 1.7e-4\nIMU.NoiseAcc: 2.0e-3\n"
            "IMU.GyroWalk: 2.0e-5\nIMU.AccWalk: 3.0e-3\nIMU.Frequency: 200\n"
            "IMU.T_b_c1: !!opencv-matrix\n"
            "  rows: 4\n  cols: 4\n  dt: f\n"
            "  data: [0, 0, 1, 0.1,  -1, 0, 0, 0.02,  0, -1, 0, -0.03,"
            "  0, 0, 0, 1]\n"
            "ORBextractor.nFeatures: 1000\nORBextractor.scaleFactor: 1.2\n"
            "ORBextractor.nLevels: 8\n"
        )
        cam, cfg, calib = load_settings(str(p), sensor=IMU_STEREO)
        assert abs(cam.bf - 0.11 * 450.0) < 1e-6
        Rbc = np.asarray(calib.Rbc)
        assert np.allclose(Rbc, [[0, 0, 1], [-1, 0, 0], [0, -1, 0]], atol=1e-6)
        assert np.allclose(np.asarray(calib.tbc), [0.1, 0.02, -0.03], atol=1e-6)
        # walk sigmas divided by sqrt(freq): 2e-5 / sqrt(200)
        assert abs(float(calib.walk_g) - 2.0e-5 / np.sqrt(200.0)) < 1e-12

    def test_missing_required_key(self, tmp_path):
        from orb_slam3_comments_ghr_tpu.io.config_yaml import load_settings

        p = tmp_path / "bad.yaml"
        p.write_text("%YAML:1.0\nCamera.fy: 1.0\n")
        with pytest.raises(KeyError, match="Camera.fx"):
            load_settings(str(p))


class TestViz:
    def test_draw_frame_and_map(self, tmp_path):
        import jax

        jax.config.update("jax_platforms", "cpu")
        from orb_slam3_comments_ghr_tpu.utils import viz, synthetic
        from orb_slam3_comments_ghr_tpu.ops import cameras
        from orb_slam3_comments_ghr_tpu.system import SLAM
        from orb_slam3_comments_ghr_tpu.utils.config import SlamConfig

        cam = cameras.euroc_cam0()
        world = synthetic.make_world(9, n_points=2000)
        poses = synthetic.circular_trajectory(12)
        cfg = SlamConfig(n_features=256, local_points_cap=1024,
                         local_ba_points=1024, min_init_matches=50)
        slam = SLAM(cam, cfg)
        feats = None
        for i, (R, t) in enumerate(poses):
            feats, _ = synthetic.render_features(world, cam, R, t, n_feat=256, seed=60 + i)
            slam.track_features(feats, i * 0.05)
        img = np.zeros((cam.height, cam.width), np.float32)
        f_path = str(tmp_path / "frame.png")
        m_path = str(tmp_path / "map.png")
        out = viz.draw_frame(img, feats, state="OK", path=f_path)
        assert out.shape == (cam.height, cam.width, 3)
        m = viz.draw_map(slam.map, path=m_path)
        assert m.shape[2] == 3
        assert os.path.getsize(f_path) > 0 and os.path.getsize(m_path) > 0


class TestNativeLoader:
    def test_euroc_with_native_prefetch(self, tmp_path):
        from orb_slam3_comments_ghr_tpu.io.native_loader import PrefetchLoader

        paths = []
        for i in range(6):
            p = str(tmp_path / f"{i}.npy")
            np.save(p, np.full((40, 50), float(i), np.float32))
            paths.append(p)
        ld = PrefetchLoader(paths, n_workers=2, capacity=3)
        outs = list(ld)
        assert len(outs) == 6
        for i, o in enumerate(outs):
            assert o.shape == (40, 50)
            assert float(o[0, 0]) == float(i)  # strict in-order delivery
        ld.close()
