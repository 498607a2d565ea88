"""Batched PnP RANSAC for relocalization.

Replaces MLPnPsolver (reference: src/MLPnPsolver.cpp, used only by
Tracking::Relocalization at Tracking.cc:4508-4548): instead of a sequential
RANSAC loop with adaptive iteration counts, ALL hypotheses are generated and
scored in one vmapped batch (minimal sets of 6, linear DLT PnP with
orthogonality projection), then the best hypothesis is polished by the
standard pose LM (optim.pose_opt). Acceptance thresholds mirror the reference
ladder (min inliers, chi2 gating)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import lie, cameras
from . import pose_opt

N_HYPOTHESES = 256
MIN_SET = 6


def _dlt_pnp(K_inv, X, x):
    """Linear PnP from 6+ correspondences. X: (S,3) world; x: (S,2) pixels.
    Returns (R, t) world->cam."""
    xn = jnp.concatenate([x, jnp.ones_like(x[:, :1])], -1) @ K_inv.T  # (S,3)
    u = xn[:, 0] / xn[:, 2]
    v = xn[:, 1] / xn[:, 2]
    Xh = jnp.concatenate([X, jnp.ones_like(X[:, :1])], -1)  # (S,4)
    z4 = jnp.zeros_like(Xh)
    rows_u = jnp.concatenate([Xh, z4, -u[:, None] * Xh], axis=-1)  # (S,12)
    rows_v = jnp.concatenate([z4, Xh, -v[:, None] * Xh], axis=-1)
    A = jnp.concatenate([rows_u, rows_v], axis=0)  # (2S,12)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    P = vt[11].reshape(3, 4)
    M = P[:, :3]
    # scale & sign: det(M) > 0 and unit-average row norm
    det = jnp.linalg.det(M)
    sgn = jnp.where(det < 0, -1.0, 1.0)
    P = P * sgn
    M = P[:, :3]
    U, S, Vt = jnp.linalg.svd(M)
    scale = jnp.mean(S)
    R = U @ Vt
    t = P[:, 3] / jnp.maximum(scale, 1e-12)
    return R, t


@functools.partial(jax.jit, static_argnames=("cam", "n_hyp"))
def pnp_ransac(
    cam: cameras.Camera,
    X: jnp.ndarray,        # (N,3) world points
    x: jnp.ndarray,        # (N,2) observed pixels
    valid: jnp.ndarray,    # (N,)
    key: jnp.ndarray,
    n_hyp: int = N_HYPOTHESES,
    inlier_th_px: float = 5.991 ** 0.5 * 2.0,
):
    """Returns (R, t, inlier_mask, n_inliers). Best-of-batch hypothesis
    refined by 2 LM rounds inside; callers run the full 4-round pose
    optimization afterwards (as Relocalization does)."""
    n = X.shape[0]
    K_inv = jnp.linalg.inv(cam.K)
    logits = jnp.where(valid, 0.0, -1e9)
    g = jax.random.gumbel(key, (n_hyp, n)) + logits[None]
    _, idx = jax.lax.top_k(g, MIN_SET)

    def hyp(i):
        R, t = _dlt_pnp(K_inv, X[i], x[i])
        pc = lie.se3_apply(R, t, X)
        uv = cameras.project(cam, pc)
        err = jnp.sum((uv - x) ** 2, -1)
        inl = valid & (pc[..., 2] > 0) & (err < inlier_th_px**2)
        return jnp.sum(inl.astype(jnp.int32)), R, t

    scores, Rs, ts = jax.vmap(hyp)(idx)
    best = jnp.argmax(scores)
    R0, t0 = Rs[best], ts[best]
    obs = pose_opt.PoseObs(
        p_world=X, uv=x, u_right=jnp.full((n,), -1.0),
        level=jnp.zeros((n,), jnp.int32), valid=valid,
    )
    R, t, inlier, n_inl = pose_opt.optimize_pose(cam, R0, t0, obs, iters_per_round=5)
    return R, t, inlier, n_inl
