"""Stereo rectification: precomputed undistort+rectify maps + device remap.

Replaces the reference's rectification-map precompute in Settings
(Settings.h:153-163 `M1l_/M2l_/M1r_/M2r_` via cv::initUndistortRectifyMap +
cv::stereoRectify) and the per-frame cv::remap in the ROS drivers
(ros_stereo_inertial.cc:102-120). Raw (unrectified) EuRoC stereo YAMLs
declare Camera2.* + Stereo.T_c1_c2; from those we

  1. compute the Bouguet rectifying rotations (common orientation, baseline
     along x),
  2. precompute per-camera (H, W, 2) sampling maps on the host ONCE
     (rectified pixel -> raw-image source coordinate, through the inverse
     rectifying rotation and the distortion model),
  3. apply them per frame with one jitted bilinear-gather remap on device —
     the maps are compile-time-ish constants riding HBM, the remap fuses
     with the extractor's first pyramid level.

The rectified rig is a clean pinhole pair with identical intrinsics and
bf = fx * baseline, which is exactly what the stereo row-matcher assumes.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from ..ops import cameras


def _rect_rotations(R12: np.ndarray, t12: np.ndarray):
    """Bouguet rectification: rows of R_rect are the new common axes in
    cam1 coordinates (x along the baseline); R1 = R_rect, R2 = R_rect @ R12
    (x_rect = R1 x_c1 = R2 x_c2 up to the pure baseline offset)."""
    t = np.asarray(t12, np.float64)
    nt = np.linalg.norm(t)
    e1 = t / nt
    if e1[0] < 0:
        e1 = -e1  # keep +x pointing from left to right camera
    e2 = np.array([-e1[1], e1[0], 0.0])
    n2 = np.linalg.norm(e2)
    if n2 < 1e-9:
        e2 = np.array([0.0, 1.0, 0.0])
    else:
        e2 /= n2
    e3 = np.cross(e1, e2)
    R_rect = np.stack([e1, e2, e3])  # rows
    R1 = R_rect
    R2 = R_rect @ np.asarray(R12, np.float64)
    return R1, R2, float(nt)


def _project_radtan(intr: dict, rays: np.ndarray) -> np.ndarray:
    """Forward projection through the radial-tangential (plumb-bob) model the
    raw EuRoC pinhole YAMLs use (Camera1.k1 k2 p1 p2) — the distortion the
    reference undoes with cv::initUndistortRectifyMap."""
    x = rays[..., 0] / rays[..., 2]
    y = rays[..., 1] / rays[..., 2]
    k1 = intr.get("k1", 0.0)
    k2 = intr.get("k2", 0.0)
    p1 = intr.get("p1", 0.0)
    p2 = intr.get("p2", 0.0)
    k3 = intr.get("k3", 0.0)
    r2 = x * x + y * y
    rad = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * rad + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * rad + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    u = intr["fx"] * xd + intr["cx"]
    v = intr["fy"] * yd + intr["cy"]
    return np.stack([u, v], -1)


def _source_map(intr: dict, cam_new: cameras.Camera,
                R_rect: np.ndarray) -> np.ndarray:
    """(H, W, 2) float32: for each rectified pixel, the raw-image source
    coordinate: ray = Knew^-1 [u v 1] -> rotate back by R_rect^T -> project
    through the raw distorted model."""
    h, w = cam_new.height, cam_new.width
    u, v = np.meshgrid(np.arange(w, dtype=np.float64),
                       np.arange(h, dtype=np.float64))
    rays = np.stack(
        [(u - cam_new.cx) / cam_new.fx, (v - cam_new.cy) / cam_new.fy,
         np.ones_like(u)], -1,
    )
    rays_c = rays @ R_rect  # R_rect^T applied to rows
    return _project_radtan(intr, rays_c).astype(np.float32)


@functools.partial(__import__("jax").jit)
def remap_bilinear(img, src_map):
    """Bilinear remap (cv::remap INTER_LINEAR): img (H,W) float32,
    src_map (H,W,2) raw-image (x, y) per output pixel. Out-of-range samples
    clamp to the border (BORDER_REPLICATE)."""
    import jax.numpy as jnp

    h, w = img.shape
    x = jnp.clip(src_map[..., 0], 0.0, w - 1.001)
    y = jnp.clip(src_map[..., 1], 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    flat = img.reshape(-1)

    def at(yy, xx):
        return flat[yy * w + xx]

    v00 = at(y0, x0)
    v01 = at(y0, x0 + 1)
    v10 = at(y0 + 1, x0)
    v11 = at(y0 + 1, x0 + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


@dataclasses.dataclass
class StereoRectifier:
    """Precomputed rectification of a raw stereo rig."""

    cam_rect: cameras.Camera     # common rectified pinhole (bf set)
    map_left: np.ndarray         # (H, W, 2)
    map_right: np.ndarray

    def rectify(self, img_left, img_right):
        import jax.numpy as jnp

        l = remap_bilinear(jnp.asarray(img_left, jnp.float32),
                           jnp.asarray(self.map_left))
        r = remap_bilinear(jnp.asarray(img_right, jnp.float32),
                           jnp.asarray(self.map_right))
        return l, r


def build_rectifier(intr1: dict, intr2: dict, R12: np.ndarray,
                    t12: np.ndarray, width: int, height: int,
                    fps: float = 20.0) -> StereoRectifier:
    """intr1/intr2: raw distorted-pinhole intrinsics dicts
    {fx fy cx cy k1 k2 p1 p2}; x_c1 = R12 @ x_c2 + t12 (Stereo.T_c1_c2,
    right-camera points expressed in the left frame)."""
    R1, R2, baseline = _rect_rotations(R12, t12)
    f_new = 0.5 * (intr1["fy"] + intr2["fy"])
    cam_rect = cameras.Camera(
        kind=cameras.PINHOLE, fx=f_new, fy=f_new,
        cx=width / 2.0, cy=height / 2.0,
        width=width, height=height,
        bf=f_new * baseline, fps=fps,
    )
    return StereoRectifier(
        cam_rect=cam_rect,
        map_left=_source_map(intr1, cam_rect, R1),
        map_right=_source_map(intr2, cam_rect, R2),
    )
