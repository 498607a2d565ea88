"""Stereo rectification precompute (Settings.h:153-163) + CLAHE
(ros_stereo_inertial.cc:68-69): raw EuRoC-style stereo YAMLs must produce a
rectified pinhole rig whose epipolar lines are image rows."""

import os
import textwrap

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_comments_ghr_tpu.io import rectify
from orb_slam3_comments_ghr_tpu.ops import cameras, lie


# EuRoC MH cam0/cam1 raw calibration (sensor.yaml values)
INTR1 = dict(fx=458.654, fy=457.296, cx=367.215, cy=248.375,
             k1=-0.28340811, k2=0.07395907, p1=0.00019359, p2=1.76187114e-05)
INTR2 = dict(fx=457.587, fy=456.134, cx=379.999, cy=255.238,
             k1=-0.28368365, k2=0.07451284, p1=-0.00010473, p2=-3.55590700e-05)
# T_c1_c2 (right-in-left) close to the real EuRoC extrinsics: ~11 cm along x
R12 = np.asarray(lie.so3_exp(jnp.asarray([0.003, -0.002, 0.001])))
T12 = np.array([0.1101, -0.0002, 0.0003])


class TestRectification:
    def test_rect_rotations_geometry(self):
        R1, R2, baseline = rectify._rect_rotations(R12, T12)
        # orthonormal
        np.testing.assert_allclose(R1 @ R1.T, np.eye(3), atol=1e-6)
        np.testing.assert_allclose(R2 @ R2.T, np.eye(3), atol=1e-6)
        # baseline maps onto +x
        b = R1 @ T12
        assert b[0] > 0
        np.testing.assert_allclose(b[1:], 0.0, atol=1e-9)
        # rectified frames share one orientation: R1 * R12 == R2
        np.testing.assert_allclose(R1 @ R12, R2, atol=1e-6)
        assert abs(baseline - np.linalg.norm(T12)) < 1e-12

    def test_epipolar_rows_align(self):
        """Random 3D points project to the SAME ROW in both rectified views,
        with disparity = bf / depth."""
        rig = rectify.build_rectifier(INTR1, INTR2, R12, T12, 752, 480)
        cam = rig.cam_rect
        R1, R2, baseline = rectify._rect_rotations(R12, T12)
        rng = np.random.default_rng(3)
        pts_c1 = np.stack([
            rng.uniform(-2, 2, 64), rng.uniform(-1.5, 1.5, 64),
            rng.uniform(4, 12, 64),
        ], -1)
        pts_c2 = (pts_c1 - T12) @ R12  # R12^T (x - t)
        uv_l = np.asarray(cameras.project(cam, jnp.asarray(pts_c1 @ R1.T)))
        uv_r = np.asarray(cameras.project(cam, jnp.asarray(pts_c2 @ R2.T)))
        np.testing.assert_allclose(uv_l[:, 1], uv_r[:, 1], atol=1e-3)
        z_rect = (pts_c1 @ R1.T)[:, 2]
        disparity = uv_l[:, 0] - uv_r[:, 0]
        np.testing.assert_allclose(disparity, cam.bf / z_rect, rtol=1e-4)

    def test_remap_identity(self):
        """A zero-distortion, identity-extrinsics rig leaves the image
        (almost) unchanged under remap."""
        intr = dict(fx=400.0, fy=400.0, cx=376.0, cy=240.0,
                    k1=0.0, k2=0.0, p1=0.0, p2=0.0)
        rig = rectify.build_rectifier(
            intr, intr, np.eye(3), np.array([0.11, 0.0, 0.0]), 752, 480)
        rng = np.random.default_rng(0)
        img = rng.random((480, 752)).astype(np.float32) * 255
        out, _ = rig.rectify(img, img)
        out = np.asarray(out)
        # identical sampling grid up to the (cx, cy) recentering shift
        dy = int(round(240.0 - intr["cy"]))
        assert out.shape == img.shape
        err = np.abs(out[50:-50, 50:-50] - img[50:-50, 50:-50]).mean()
        assert err < 20.0  # small shift-induced blur only

    def test_yaml_ingestion(self, tmp_path):
        yaml = textwrap.dedent(f"""\
            %YAML:1.0
            File.version: "1.0"
            Camera.type: "PinHole"
            Camera1.fx: {INTR1['fx']}
            Camera1.fy: {INTR1['fy']}
            Camera1.cx: {INTR1['cx']}
            Camera1.cy: {INTR1['cy']}
            Camera1.k1: {INTR1['k1']}
            Camera1.k2: {INTR1['k2']}
            Camera1.p1: {INTR1['p1']}
            Camera1.p2: {INTR1['p2']}
            Camera2.fx: {INTR2['fx']}
            Camera2.fy: {INTR2['fy']}
            Camera2.cx: {INTR2['cx']}
            Camera2.cy: {INTR2['cy']}
            Camera2.k1: {INTR2['k1']}
            Camera2.k2: {INTR2['k2']}
            Camera2.p1: {INTR2['p1']}
            Camera2.p2: {INTR2['p2']}
            Camera.width: 752
            Camera.height: 480
            Camera.fps: 20.0
            Stereo.ThDepth: 60.0
            Stereo.T_c1_c2: !!opencv-matrix
              rows: 4
              cols: 4
              dt: f
              data: [1.0, 0.0, 0.0, 0.1101,
                     0.0, 1.0, 0.0, -0.0002,
                     0.0, 0.0, 1.0, 0.0003,
                     0.0, 0.0, 0.0, 1.0]
            ORBextractor.nFeatures: 1200
            ORBextractor.scaleFactor: 1.2
            ORBextractor.nLevels: 8
            ORBextractor.iniThFAST: 20
            ORBextractor.minThFAST: 7
        """)
        p = tmp_path / "raw_stereo.yaml"
        p.write_text(yaml)
        from orb_slam3_comments_ghr_tpu.io.config_yaml import (
            load_settings, load_stereo_rig,
        )
        from orb_slam3_comments_ghr_tpu.utils.config import STEREO

        cam, cfg, _ = load_settings(str(p), sensor=STEREO)
        rig = load_stereo_rig(str(p))
        assert rig is not None
        # the returned camera IS the rectified rig, bf = f * baseline
        assert cam.kind == cameras.PINHOLE
        assert abs(cam.bf - cam.fx * 0.11010005) < 1e-2
        assert rig.map_left.shape == (480, 752, 2)
        # mono settings from the same file are untouched (no rectification)
        cam_mono, _, _ = load_settings(str(p))
        assert abs(cam_mono.fx - INTR1["fx"]) < 1e-6


class TestClahe:
    def test_uniform_stays_uniform(self):
        from orb_slam3_comments_ghr_tpu.frontend.clahe import clahe

        img = np.full((480, 752), 100.0, np.float32)
        out = np.asarray(clahe(jnp.asarray(img)))
        assert out.std() < 3.0
        assert 0.0 <= out.min() and out.max() <= 255.0

    def test_stretches_low_contrast(self):
        from orb_slam3_comments_ghr_tpu.frontend.clahe import clahe

        rng = np.random.default_rng(1)
        # low-contrast texture squeezed into [118, 138]
        img = (rng.random((480, 752)) * 20 + 118).astype(np.float32)
        out = np.asarray(clahe(jnp.asarray(img)))
        assert out.std() > 2.5 * img.std(), (img.std(), out.std())
        assert out.max() <= 255.0 and out.min() >= 0.0

    def test_improves_fast_detection_in_dark(self):
        """A dark rendering of the textured scene must yield MORE valid FAST
        keypoints after CLAHE (the reference drivers' reason for it)."""
        from orb_slam3_comments_ghr_tpu.frontend.clahe import clahe
        from orb_slam3_comments_ghr_tpu.frontend.batched import extract_batched
        from orb_slam3_comments_ghr_tpu.utils import synthetic

        cam = cameras.euroc_cam0()
        scene = synthetic.make_textured_scene(5)
        poses = synthetic.circular_trajectory(4)
        img = synthetic.render_image(scene, cam, *poses[0]) * 0.12  # dark
        f0 = extract_batched(jnp.asarray(img), n_features=512)
        f1 = extract_batched(clahe(jnp.asarray(img)), n_features=512)
        n0 = int(np.asarray(f0.valid).sum())
        n1 = int(np.asarray(f1.valid).sum())
        assert n1 > n0, (n0, n1)
