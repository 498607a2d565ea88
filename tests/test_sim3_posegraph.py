import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam3_comments_ghr_tpu.ops import lie, cameras
from orb_slam3_comments_ghr_tpu.optim import sim3, posegraph

CAM = cameras.euroc_cam0()


def sim3_pair(key, n=200, scale=1.3, noise=0.01, outliers=0.0):
    kp, kn, ko = jax.random.split(key, 3)
    uv = jax.random.uniform(kp, (n, 2)) * jnp.array([700.0, 440.0]) + 20.0
    p2 = cameras.unproject(CAM, uv) * (jax.random.uniform(kn, (n, 1)) * 6 + 4)
    R = lie.so3_exp(jnp.array([0.1, -0.2, 0.3]))
    t = jnp.array([0.4, -0.2, 0.6])
    s = jnp.array(scale)
    p1 = s * (p2 @ R.T) + t + jax.random.normal(ko, (n, 3)) * noise
    valid = jnp.ones(n, bool)
    if outliers > 0:
        bad = jax.random.uniform(ko, (n,)) < outliers
        p1 = jnp.where(bad[:, None], p1 + 5.0, p1)
    return p1, p2, (s, R, t), valid


class TestSim3Ransac:
    def test_recovers_similarity(self):
        p1, p2, (s, R, t), valid = sim3_pair(jax.random.PRNGKey(0))
        lv = jnp.zeros(p1.shape[0], jnp.int32)
        se, Re, te, inl, n = sim3.sim3_ransac(
            CAM, p1, p2, lv, lv, valid, jax.random.PRNGKey(1)
        )
        assert abs(float(se) - 1.3) < 0.02
        assert float(jnp.linalg.norm(lie.so3_log(Re @ R.T))) < 0.02
        assert int(n) > 150

    def test_with_outliers(self):
        p1, p2, (s, R, t), valid = sim3_pair(jax.random.PRNGKey(2), outliers=0.3)
        lv = jnp.zeros(p1.shape[0], jnp.int32)
        se, Re, te, inl, n = sim3.sim3_ransac(
            CAM, p1, p2, lv, lv, valid, jax.random.PRNGKey(3)
        )
        assert abs(float(se) - 1.3) < 0.05
        assert float(jnp.linalg.norm(lie.so3_log(Re @ R.T))) < 0.05

    def test_fix_scale(self):
        p1, p2, (s, R, t), valid = sim3_pair(jax.random.PRNGKey(4), scale=1.0)
        lv = jnp.zeros(p1.shape[0], jnp.int32)
        se, Re, te, inl, n = sim3.sim3_ransac(
            CAM, p1, p2, lv, lv, valid, jax.random.PRNGKey(5), fix_scale=True
        )
        assert float(se) == 1.0
        assert int(n) > 150

    def test_optimize_refines(self):
        p1, p2, (s, R, t), valid = sim3_pair(jax.random.PRNGKey(6), noise=0.005)
        lv = jnp.zeros(p1.shape[0], jnp.int32)
        uv1 = cameras.project(CAM, p1)
        uv2 = cameras.project(CAM, p2)
        # start from a perturbed similarity
        s0 = s * 1.05
        R0 = lie.so3_exp(jnp.array([0.02, 0.0, -0.01])) @ R
        t0 = t + 0.05
        se, Re, te, inl, n = sim3.optimize_sim3(
            CAM, s0, R0, t0, p1, uv1, lv, p2, uv2, lv, valid
        )
        assert abs(float(se) - float(s)) < 0.01
        assert float(jnp.linalg.norm(lie.so3_log(Re @ R.T))) < 0.01
        assert int(n) > 150


class TestPoseGraph:
    def _ring_problem(self, K=24, drift_per_step=0.02, key=jax.random.PRNGKey(0)):
        """Odometry ring with accumulated drift + one loop edge carrying the
        true relative transform — the classic pose-graph correction setup."""
        # ground truth: cameras on a circle
        angles = np.linspace(0, 2 * np.pi, K, endpoint=False)
        R_gt, t_gt = [], []
        for a in angles:
            R = np.asarray(lie.so3_exp(jnp.array([0.0, a, 0.0])))
            c = np.array([np.sin(a) * 3, 0.0, -np.cos(a) * 3])
            R_gt.append(R)
            t_gt.append(-R @ c)
        R_gt = jnp.asarray(np.stack(R_gt), jnp.float32)
        t_gt = jnp.asarray(np.stack(t_gt), jnp.float32)
        s_gt = jnp.ones(K)

        # odometry with drift: relative measurements are exact, but the
        # integrated initial estimate drifts (rotation bias per step)
        s0 = [1.0]
        R0 = [np.asarray(R_gt[0])]
        t0 = [np.asarray(t_gt[0])]
        for k in range(1, K):
            # true relative i->i-1
            s_rel, R_rel, t_rel = lie.sim3_mul(
                s_gt[k], R_gt[k], t_gt[k],
                *lie.sim3_inv(s_gt[k - 1], R_gt[k - 1], t_gt[k - 1]),
            )
            # corrupt with drift
            dR = np.asarray(lie.so3_exp(jnp.array([0.0, drift_per_step, 0.0])))
            R_rel_n = np.asarray(R_rel) @ dR
            s_new, R_new, t_new = lie.sim3_mul(
                jnp.asarray(s_rel), jnp.asarray(R_rel_n), jnp.asarray(t_rel),
                jnp.asarray(s0[-1]), jnp.asarray(R0[-1]), jnp.asarray(t0[-1]),
            )
            s0.append(float(s_new))
            R0.append(np.asarray(R_new))
            t0.append(np.asarray(t_new))
        s0 = jnp.asarray(s0, jnp.float32)
        R0 = jnp.asarray(np.stack(R0), jnp.float32)
        t0 = jnp.asarray(np.stack(t0), jnp.float32)

        # edges: consecutive (measured from the DRIFTED estimates — odometry
        # is self-consistent) + loop edge K-1 -> 0 with the TRUE relative
        ei, ej, es, eR, et, ew = [], [], [], [], [], []
        for k in range(1, K):
            s_rel, R_rel, t_rel = lie.sim3_mul(
                s0[k], R0[k], t0[k], *lie.sim3_inv(s0[k - 1], R0[k - 1], t0[k - 1])
            )
            ei.append(k); ej.append(k - 1)
            es.append(s_rel); eR.append(R_rel); et.append(t_rel); ew.append(1.0)
        s_loop, R_loop, t_loop = lie.sim3_mul(
            s_gt[K - 1], R_gt[K - 1], t_gt[K - 1],
            *lie.sim3_inv(s_gt[0], R_gt[0], t_gt[0]),
        )
        ei.append(K - 1); ej.append(0)
        es.append(s_loop); eR.append(R_loop); et.append(t_loop); ew.append(5.0)

        E = len(ei)
        prob = posegraph.PoseGraphProblem(
            s=s0, R=R0, t=t0,
            fixed=jnp.arange(K) == 0,
            e_i=jnp.asarray(ei, jnp.int32), e_j=jnp.asarray(ej, jnp.int32),
            e_s=jnp.stack(es), e_R=jnp.stack(eR), e_t=jnp.stack(et),
            e_valid=jnp.ones(E, bool), e_weight=jnp.asarray(ew, jnp.float32),
        )
        return prob, (s_gt, R_gt, t_gt)

    def test_corrects_drift(self):
        prob, (s_gt, R_gt, t_gt) = self._ring_problem()
        # drift before correction is large
        pre_err = float(jnp.linalg.norm(lie.so3_log(prob.R[-1] @ R_gt[-1].T)))
        s, R, t, costs = posegraph.optimize_pose_graph(prob, iters=20)
        post_err = float(jnp.linalg.norm(lie.so3_log(R[-1] @ R_gt[-1].T)))
        assert pre_err > 0.2
        assert post_err < 0.05, post_err
        # centers too
        c_est = -jnp.einsum("kji,kj->ki", R, t / s[:, None])
        c_gt = -jnp.einsum("kji,kj->ki", R_gt, t_gt)
        assert float(jnp.linalg.norm(c_est - c_gt, axis=-1).max()) < 0.25

    def test_fixed_vertex_unmoved(self):
        prob, _ = self._ring_problem()
        s, R, t, _ = posegraph.optimize_pose_graph(prob, iters=10)
        np.testing.assert_allclose(np.asarray(R[0]), np.asarray(prob.R[0]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(t[0]), np.asarray(prob.t[0]), atol=1e-4)

    def test_dof4_freezes_scale(self):
        prob, _ = self._ring_problem()
        s, R, t, _ = posegraph.optimize_pose_graph(prob, iters=10, dof4=True)
        np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-3)


class TestPoseGraphCG(TestPoseGraph):
    """Matrix-free block-Jacobi CG solver: must reproduce the dense result
    (same GN linearization) and scale to thousands of keyframes with O(E)
    memory (Optimizer.cc:4539's sparse-solver role)."""

    def test_cg_matches_dense(self):
        prob, (s_gt, R_gt, t_gt) = self._ring_problem()
        sd, Rd, td, _ = posegraph.optimize_pose_graph(prob, iters=15)
        sc, Rc, tc, _ = posegraph.optimize_pose_graph_cg(
            prob, iters=15, cg_iters=120
        )
        cd = -jnp.einsum("kji,kj->ki", Rd, td / sd[:, None])
        cc = -jnp.einsum("kji,kj->ki", Rc, tc / sc[:, None])
        assert float(jnp.linalg.norm(cd - cc, axis=-1).max()) < 0.03

    def test_cg_corrects_drift(self):
        prob, (s_gt, R_gt, t_gt) = self._ring_problem()
        s, R, t, _ = posegraph.optimize_pose_graph_cg(prob, iters=20)
        post_err = float(jnp.linalg.norm(lie.so3_log(R[-1] @ R_gt[-1].T)))
        assert post_err < 0.05, post_err

    def test_4k_keyframes_scale(self):
        """4096-vertex ring + cross edges: the dense Hessian would be
        (28672)^2 floats = 3.3 GB; the CG path stores only per-edge blocks
        (~5k x 3 x 49 floats ~ 3 MB) and must still remove the drift."""
        import time

        K = 4096
        prob, (s_gt, R_gt, t_gt) = self._ring_problem(
            K=K, drift_per_step=0.0005
        )
        # add sparse long-range covisibility edges (every 64th pair), measured
        # from the drifted odometry like the consecutive ones
        ei, ej, es, eR, et = [], [], [], [], []
        for k in range(64, K, 64):
            s_rel, R_rel, t_rel = lie.sim3_mul(
                prob.s[k], prob.R[k], prob.t[k],
                *lie.sim3_inv(prob.s[k - 32], prob.R[k - 32], prob.t[k - 32]),
            )
            ei.append(k); ej.append(k - 32)
            es.append(s_rel); eR.append(R_rel); et.append(t_rel)
        prob = prob._replace(
            e_i=jnp.concatenate([prob.e_i, jnp.asarray(ei, jnp.int32)]),
            e_j=jnp.concatenate([prob.e_j, jnp.asarray(ej, jnp.int32)]),
            e_s=jnp.concatenate([prob.e_s, jnp.stack(es)]),
            e_R=jnp.concatenate([prob.e_R, jnp.stack(eR)]),
            e_t=jnp.concatenate([prob.e_t, jnp.stack(et)]),
            e_valid=jnp.ones(prob.e_valid.shape[0] + len(ei), bool),
            e_weight=jnp.concatenate(
                [prob.e_weight, jnp.ones(len(ei), jnp.float32)]
            ),
        )
        pre_err = float(jnp.linalg.norm(lie.so3_log(prob.R[-1] @ R_gt[-1].T)))
        t0 = time.monotonic()
        s, R, t, _ = posegraph.optimize_pose_graph_cg(
            prob, iters=10, cg_iters=150
        )
        jax.block_until_ready(t)
        wall = time.monotonic() - t0
        post_err = float(jnp.linalg.norm(lie.so3_log(R[-1] @ R_gt[-1].T)))
        assert pre_err > 0.5, pre_err
        assert post_err < 0.1 * pre_err, (pre_err, post_err, wall)

    def test_solve_dispatch(self):
        prob, _ = self._ring_problem()
        s, R, t, _ = posegraph.solve_pose_graph(prob, iters=5)
        assert s.shape[0] == prob.s.shape[0]
