"""Distributed bundle adjustment over a device mesh.

The SLAM analog of model parallelism mandated by the north star (SURVEY.md
§2.3 P6, §5.8): the landmark blocks and their observations are sharded across
devices along the point axis; every device evaluates residuals/Jacobians and
Schur-eliminates its own landmarks locally, then the reduced camera system
(small, dense) is summed with `psum` over ICI and solved replicated; landmark
back-substitution is again local. The only communication per LM iteration is
one psum of (K*6)^2 + K*6 floats + the scalar costs — the reference has no
distributed story at all (single-process pthreads).

Works on any jax.sharding.Mesh axis, including the CPU host-device mesh used
in tests (xla_force_host_platform_device_count).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import lie, cameras
from ..optim import ba, robust


def shard_problem(prob: ba.BAProblem, mesh: Mesh, axis: str = "mp") -> ba.BAProblem:
    """Place point-indexed arrays sharded along `axis`, camera arrays
    replicated. P must be divisible by the axis size."""
    pspec = NamedSharding(mesh, P(axis))
    rspec = NamedSharding(mesh, P())
    return ba.BAProblem(
        cam_R=jax.device_put(prob.cam_R, rspec),
        cam_t=jax.device_put(prob.cam_t, rspec),
        cam_fixed=jax.device_put(prob.cam_fixed, rspec),
        p=jax.device_put(prob.p, pspec),
        p_valid=jax.device_put(prob.p_valid, pspec),
        obs_cam=jax.device_put(prob.obs_cam, pspec),
        obs_uv=jax.device_put(prob.obs_uv, pspec),
        obs_ur=jax.device_put(prob.obs_ur, pspec),
        obs_level=jax.device_put(prob.obs_level, pspec),
        obs_valid=jax.device_put(prob.obs_valid, pspec),
        obs_rig=(None if prob.obs_rig is None
                 else jax.device_put(prob.obs_rig, pspec)),
        rig_R=(None if prob.rig_R is None
               else jax.device_put(prob.rig_R, rspec)),
        rig_t=(None if prob.rig_t is None
               else jax.device_put(prob.rig_t, rspec)),
    )


def bundle_adjust_sharded(
    cam: cameras.Camera,
    prob: ba.BAProblem,
    mesh: Mesh,
    axis: str = "mp",
    iters: int = 10,
    use_huber: bool = True,
    lam0=None,
):
    """Distributed LM with Schur reduction. Same semantics as
    optim.ba.bundle_adjust; landmark work sharded over `mesh[axis]`.
    Returns (cam_R, cam_t, p, inlier, cost, lam) — lam is threaded in/out so
    the mapper can chain abortable bites exactly like the single-device GBA
    (mbStopGBA, LoopClosing.cc:3067)."""
    K = prob.cam_R.shape[0]

    point_spec = P(axis)
    rep = P()
    in_specs = ba.BAProblem(
        cam_R=rep, cam_t=rep, cam_fixed=rep,
        p=point_spec, p_valid=point_spec,
        obs_cam=point_spec, obs_uv=point_spec, obs_ur=point_spec,
        obs_level=point_spec, obs_valid=point_spec,
        obs_rig=None if prob.obs_rig is None else point_spec,
        rig_R=None if prob.rig_R is None else rep,
        rig_t=None if prob.rig_t is None else rep,
    )
    if lam0 is None:
        lam0 = jnp.asarray(1e-4, prob.p.dtype)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(in_specs, rep),
        out_specs=(rep, rep, point_spec, point_spec, rep, rep),
    )
    def run(p: ba.BAProblem, lam_in):
        R, t, pts = p.cam_R, p.cam_t, p.p

        def body(_, carry):
            R, t, pts, lam = carry
            local = p._replace(cam_R=R, cam_t=t, p=pts)
            r, Jc, Jp, w, chi2, row_mask, delta2 = ba._obs_terms(
                cam, local, R, t, pts, use_huber
            )
            cost0 = jax.lax.psum(
                ba._cost(chi2, delta2, p.obs_valid, use_huber), axis
            )
            H_pp, b_p, H_cc, b_c, W = ba._assemble(local, r, Jc, Jp, w, row_mask, K)
            Hpp_inv = ba._point_blocks_inv(H_pp, p.p_valid, lam)
            S, rhs = ba._reduced_system(p.obs_cam, H_cc, b_c, W, Hpp_inv, b_p, K)
            # THE collective: reduce the camera system across landmark shards
            S = jax.lax.psum(S, axis)
            rhs = jax.lax.psum(rhs, axis)
            H_cc_diag = jax.lax.psum(jnp.diagonal(H_cc, axis1=-2, axis2=-1), axis)
            dxc = ba._solve_reduced(S, rhs, p.cam_fixed, H_cc_diag, lam, K)
            dp = ba._backsubstitute(p.obs_cam, W, Hpp_inv, b_p, p.p_valid, dxc)

            dR, dt = lie.se3_exp(dxc)
            R_new, t_new = lie.se3_mul(dR, dt, R, t)
            pts_new = pts + dp
            local_new = p._replace(cam_R=R_new, cam_t=t_new, p=pts_new)
            _, _, _, _, chi2_new, _, _ = ba._obs_terms(
                cam, local_new, R_new, t_new, pts_new, use_huber
            )
            cost1 = jax.lax.psum(
                ba._cost(chi2_new, delta2, p.obs_valid, use_huber), axis
            )
            better = cost1 < cost0
            R = jnp.where(better, R_new, R)
            t = jnp.where(better, t_new, t)
            pts = jnp.where(better, pts_new, pts)
            lam = jnp.where(better, lam * 0.5, lam * 5.0)
            return R, t, pts, lam

        R, t, pts, lam = jax.lax.fori_loop(
            0, iters, body, (R, t, pts, lam_in.astype(R.dtype))
        )
        local = p._replace(cam_R=R, cam_t=t, p=pts)
        _, _, _, _, chi2, _, delta2 = ba._obs_terms(cam, local, R, t, pts, False)
        inlier = p.obs_valid & (chi2 <= delta2)
        cost = jax.lax.psum(ba._cost(chi2, delta2, p.obs_valid, False), axis)
        return R, t, pts, inlier, cost, lam

    return jax.jit(run)(prob, lam0)
