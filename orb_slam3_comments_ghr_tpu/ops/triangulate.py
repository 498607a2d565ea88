"""DLT triangulation (batched).

Replaces GeometricTools::Triangulate (reference: src/GeometricTools.cc:62) and
the per-pair triangulations in TwoViewReconstruction/KannalaBrandt8. Inputs
are normalized bearings or pixel rays with their 3x4 projection matrices;
the linear system is solved per point via batched SVD on the 4x4 design
matrix — one fused XLA op over the whole batch."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def triangulate(P1: jnp.ndarray, P2: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray):
    """P1, P2: (3,4) or (...,3,4) projection matrices; x1, x2: (...,2)
    (homogeneous-normalized image coords matching P's convention).
    Returns (...,3) triangulated points (Euclidean)."""
    # geometry-critical: TPU-default bf16 matmuls put a ~0.4% relative
    # error on triangulated MAP-POINT positions (centimeters at room scale),
    # which lower-bounds the whole system's ATE. These are tiny matmuls —
    # full f32 costs nothing.
    with jax.default_matmul_precision("highest"):
        return _triangulate_f32(P1, P2, x1, x2)


def _triangulate_f32(P1, P2, x1, x2):
    rows = [
        x1[..., 0, None] * P1[..., 2, :] - P1[..., 0, :],
        x1[..., 1, None] * P1[..., 2, :] - P1[..., 1, :],
        x2[..., 0, None] * P2[..., 2, :] - P2[..., 0, :],
        x2[..., 1, None] * P2[..., 2, :] - P2[..., 1, :],
    ]
    A = jnp.stack(rows, axis=-2)  # (...,4,4)
    # smallest right singular vector
    _, _, vt = jnp.linalg.svd(A)
    X = vt[..., 3, :]
    w = X[..., 3]
    w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return X[..., :3] / w[..., None]


def projection_matrix(K: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray):
    """(3,4) P = K [R|t] (world->cam)."""
    Rt = jnp.concatenate([R, t[..., None]], axis=-1)
    with jax.default_matmul_precision("highest"):
        return K @ Rt
