"""Synthetic world / sequence generation — the deterministic 'fake backend'
the reference lacks (SURVEY.md §4 implication): rendered feature tracks and
images with known ground-truth trajectory, for integration tests and
benchmarks scoreable by utils.evaluation.ate_rmse."""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..frontend.types import Features
from ..ops import cameras, lie


@dataclasses.dataclass
class World:
    points: np.ndarray       # (W,3)
    desc: np.ndarray         # (W,8) uint32 per-landmark descriptor
    patches: np.ndarray      # (W,9,9) float32 texture patch (for rendering)
    priority: np.ndarray     # (W,) detection priority — a real detector
                             # re-finds the same strong corners every frame


def make_world(seed: int, n_points: int = 4000, extent=(20.0, 12.0, 8.0),
               center=(0.0, 0.0, 10.0)) -> World:
    rng = np.random.default_rng(seed)
    pts = (rng.random((n_points, 3)) - 0.5) * np.asarray(extent) + np.asarray(center)
    desc = rng.integers(0, 2**32, (n_points, 8), dtype=np.uint32)
    patches = rng.random((n_points, 9, 9)).astype(np.float32) * 200.0 + 30.0
    priority = rng.random(n_points).astype(np.float32)
    return World(points=pts.astype(np.float32), desc=desc, patches=patches,
                 priority=priority)


def circular_trajectory(n_frames: int, radius: float = 2.0, z_amp: float = 0.2,
                        look_at=(0.0, 0.0, 10.0), arc: float = 0.8):
    """List of (R_cw, t_cw) world->cam poses on a horizontal arc, camera
    yawing to keep the world centroid in view."""
    poses = []
    look = np.asarray(look_at)
    for i in range(n_frames):
        a = arc * 2 * np.pi * i / n_frames
        c = np.array([radius * np.sin(a), 0.3 * np.sin(2 * a), z_amp * np.sin(3 * a)])
        fwd = look - c
        fwd = fwd / np.linalg.norm(fwd)
        right = np.cross(fwd, np.array([0.0, -1.0, 0.0]))
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        R_wc = np.stack([right, down, fwd], axis=1)  # cam axes in world
        R_cw = R_wc.T
        t_cw = -R_cw @ c
        poses.append((R_cw.astype(np.float32), t_cw.astype(np.float32)))
    return poses


def render_features(
    world: World,
    cam: cameras.Camera,
    R_cw: np.ndarray,
    t_cw: np.ndarray,
    n_feat: int = 1024,
    noise_px: float = 0.4,
    desc_flip_bits: int = 6,
    seed: int = 0,
) -> Features:
    """Project world landmarks into the view and emit a Features pytree with
    per-landmark descriptors (a few bits flipped per observation) — the ideal
    front end, isolating the pipeline from the extractor."""
    rng = np.random.default_rng(seed)
    pc = world.points @ R_cw.T + t_cw
    z = pc[:, 2]
    uv = np.asarray(cameras.project(cam, jnp.asarray(pc)))
    vis = (z > 0.3) & np.asarray(cameras.in_image(cam, jnp.asarray(uv), 10.0))
    ids = np.nonzero(vis)[0]
    # deterministic selection by per-landmark detectability (strongest first),
    # with a small per-frame dropout to model detection flicker
    keep = rng.random(len(ids)) > 0.05
    ids = ids[keep]
    ids = ids[np.argsort(-world.priority[ids])][:n_feat]
    n = len(ids)

    xy = np.zeros((n_feat, 2), np.float32)
    desc = np.zeros((n_feat, 8), np.uint32)
    level = np.zeros((n_feat,), np.int32)
    xy[:n] = uv[ids] + rng.normal(0, noise_px, (n, 2))
    desc[:n] = world.desc[ids]
    # flip a few random bits per observation
    for _ in range(desc_flip_bits):
        word = rng.integers(0, 8, n)
        bit = rng.integers(0, 32, n).astype(np.uint32)
        desc[np.arange(n), word] ^= (np.uint32(1) << bit)
    # octave from distance (closer -> finer); keep 0 for simplicity plus a
    # sprinkle of level-1 to exercise the ladder
    level[:n] = (rng.random(n) < 0.15).astype(np.int32)

    valid = np.zeros((n_feat,), bool)
    valid[:n] = True
    return Features(
        xy=jnp.asarray(xy),
        level=jnp.asarray(level),
        angle=jnp.zeros((n_feat,), jnp.float32),
        response=jnp.where(jnp.asarray(valid), 1.0, -jnp.inf),
        desc=jnp.asarray(desc),
        valid=jnp.asarray(valid),
        u_right=jnp.full((n_feat,), -1.0, jnp.float32),
        depth=jnp.full((n_feat,), -1.0, jnp.float32),
    ), ids


def render_image(
    world: World, cam: cameras.Camera, R_cw: np.ndarray, t_cw: np.ndarray
) -> np.ndarray:
    """Rasterize the world as 9x9 texture patches at projected landmark
    positions (nearest landmark wins) — enough structure for the real FAST/
    ORB front end to latch onto."""
    h, w = cam.height, cam.width
    img = np.full((h, w), 40.0, np.float32)
    pc = world.points @ R_cw.T + t_cw
    z = pc[:, 2]
    uv = np.asarray(cameras.project(cam, jnp.asarray(pc)))
    order = np.argsort(-z)  # far first so near patches overwrite
    for i in order:
        if z[i] <= 0.3:
            continue
        u, v = int(round(uv[i, 0])), int(round(uv[i, 1]))
        if u < 5 or v < 5 or u >= w - 5 or v >= h - 5:
            continue
        img[v - 4 : v + 5, u - 4 : u + 5] = world.patches[i]
    return img


def gt_trajectory(poses) -> list:
    out = []
    for i, (R, t) in enumerate(poses):
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R
        T[:3, 3] = t
        out.append((i * 0.05, T))
    return out
