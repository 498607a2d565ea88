"""Frame feature containers (SoA pytrees, static shapes).

Replaces the reference's per-Frame std::vector<cv::KeyPoint>/cv::Mat storage
(reference: include/Frame.h:258-310) with fixed-capacity padded arrays so the
whole front end stays jittable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Features(NamedTuple):
    """Per-image ORB features, padded to a static capacity N.

    xy:       (N, 2) float32 — keypoint position in level-0 pixel coords
    level:    (N,)   int32   — pyramid octave (0..n_levels-1)
    angle:    (N,)   float32 — orientation in radians
    response: (N,)   float32 — corner response (selection score)
    desc:     (N, 8) uint32  — 256-bit rBRIEF descriptor, bit-packed
    valid:    (N,)   bool    — padding mask
    u_right:  (N,)   float32 — right-image u for stereo/RGB-D, -1 if none
                               (Frame.h mvuRight semantics)
    depth:    (N,)   float32 — metric depth, -1 if unknown (Frame.h mvDepth)
    """

    xy: jnp.ndarray
    level: jnp.ndarray
    angle: jnp.ndarray
    response: jnp.ndarray
    desc: jnp.ndarray
    valid: jnp.ndarray
    u_right: jnp.ndarray
    depth: jnp.ndarray

    @property
    def n(self) -> int:
        return self.xy.shape[0]


def empty_features(n: int) -> Features:
    return Features(
        xy=jnp.zeros((n, 2), jnp.float32),
        level=jnp.zeros((n,), jnp.int32),
        angle=jnp.zeros((n,), jnp.float32),
        response=jnp.full((n,), -jnp.inf, jnp.float32),
        desc=jnp.zeros((n, 8), jnp.uint32),
        valid=jnp.zeros((n,), bool),
        u_right=jnp.full((n,), -1.0, jnp.float32),
        depth=jnp.full((n,), -1.0, jnp.float32),
    )
