"""Inertial map merging (MergeLocal2, LoopClosing.cc:2451): a kidnap in
IMU_MONOCULAR mode spawns a second gravity-aligned metric sub-map; revisiting
known territory must weld the two maps with a yaw-only rotation (gravity
preserved), scale within the 0.9-1.1 gate, followed by MergeInertialBA
(Optimizer.cc:6034)."""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam3_comments_ghr_tpu.ops import cameras
from orb_slam3_comments_ghr_tpu.system import SLAM
from orb_slam3_comments_ghr_tpu.utils import synthetic
from orb_slam3_comments_ghr_tpu.utils.config import SlamConfig, IMU_MONOCULAR
from orb_slam3_comments_ghr_tpu.optim import imu as imu_mod

CAM = cameras.euroc_cam0()


@pytest.fixture(scope="module")
def kidnap_run():
    world = synthetic.make_world(57, n_points=3000)
    n = 300
    poses, imu_rows, times = synthetic.vi_sequence(n)
    cfg = SlamConfig(
        sensor=IMU_MONOCULAR, n_features=512, local_points_cap=2048,
        local_ba_points=2048, max_frames_between_kf=5, min_init_matches=60,
        recently_lost_secs=0.3,
        # exercise the merge machinery without waiting the reference's 15 s
        # VIBA2 gate (the gate itself is tested in test_viba2_gate below)
        loop_requires_viba2=False, loop_min_kfs=8,
    )
    calib = imu_mod.ImuCalib(
        Rbc=jnp.eye(3), tbc=jnp.zeros(3),
        noise_g=1e-4, noise_a=1e-3, walk_g=1e-6, walk_a=1e-5,
    )
    slam = SLAM(CAM, cfg, imu_calib=calib)

    # spy on every whole-map transform so the weld's rotation is observable
    transforms = []
    orig_at = slam.map.apply_transform

    def spy_at(map_id, s, R, t, **kw):
        transforms.append((int(map_id), float(s), np.asarray(R).copy(),
                           slam.map.map_imu_init.copy()))
        return orig_at(map_id, s, R, t, **kw)

    slam.map.apply_transform = spy_at

    def feed(i):
        t_frame = times[i]
        lo = times[feed.last] if feed.last >= 0 else -1.0
        chunk = imu_rows[(imu_rows[:, 0] > lo) & (imu_rows[:, 0] <= t_frame)]
        if len(chunk):
            slam.feed_imu(chunk)
        feed.last = i
        feats, _ = synthetic.render_features(
            world, CAM, *poses[i], n_feat=512, seed=5700 + i)
        return slam.track_features(feats, t_frame)

    feed.last = -1

    # phase 1: 0..7 s -> map 0 builds and IMU-initializes
    for i in range(140):
        feed(i)
    imu_init_map0 = slam.map.map_imu_init.get(0, False)
    n_maps_before = slam.map.n_maps

    # kidnap: blank frames (IMU keeps running) -> dead-reckon -> LOST -> new map
    from orb_slam3_comments_ghr_tpu.frontend.types import empty_features
    blank = empty_features(512)
    for i in range(140, 154):
        t_frame = times[i]
        lo = times[feed.last]
        chunk = imu_rows[(imu_rows[:, 0] > lo) & (imu_rows[:, 0] <= t_frame)]
        if len(chunk):
            slam.feed_imu(chunk)
        feed.last = i
        slam.track_features(blank, t_frame)
    n_maps_after = slam.map.n_maps

    # phase 2: map 1 builds in known terrain, IMU-initializes, then merges
    tracked = 0
    for i in range(154, n):
        if feed(i) is not None:
            tracked += 1

    return dict(slam=slam, transforms=transforms,
                imu_init_map0=imu_init_map0,
                n_maps_before=n_maps_before, n_maps_after=n_maps_after,
                tracked=tracked)


class TestInertialMerge:
    def test_kidnap_spawns_submap(self, kidnap_run):
        assert kidnap_run["imu_init_map0"]
        assert kidnap_run["n_maps_after"] > kidnap_run["n_maps_before"]

    def test_merged(self, kidnap_run):
        slam = kidnap_run["slam"]
        assert slam.loopcloser.n_merges >= 1, (
            slam.map.n_maps, slam.map.active_map)
        # the weld target (map 0, the older map) received the full inertial
        # stage: MergeLocal2 force-sets ImuInitialized/BA1/BA2
        # (LoopClosing.cc:2560-2574), which also disarms the
        # insufficient-excitation watchdog for the merged map
        assert slam.map.map_imu_init.get(0, False)
        assert slam.map.map_viba1.get(0, False)
        assert slam.map.map_viba2.get(0, False)

    def test_weld_preserves_gravity_and_scale(self, kidnap_run):
        """The weld transform applied to the active map must be yaw-only
        (both worlds gravity-aligned to -z) with scale inside [0.9, 1.1]."""
        slam = kidnap_run["slam"]
        # the weld = transform applied to a map at a time when BOTH maps were
        # IMU-initialized (IMU-init transforms happen when only one is)
        welds = [
            (mid, s, R) for (mid, s, R, init_flags) in kidnap_run["transforms"]
            if sum(bool(v) for v in init_flags.values()) >= 2
        ]
        assert welds, "no weld transform was recorded"
        mid, s, R = welds[0]
        assert 0.9 <= s <= 1.1
        # yaw-only: world z-axis is untouched
        assert R[2, 2] > 0.9999
        assert abs(R[0, 2]) < 1e-6 and abs(R[1, 2]) < 1e-6
        assert abs(R[2, 0]) < 1e-6 and abs(R[2, 1]) < 1e-6

    def test_tracking_survives_merge(self, kidnap_run):
        assert kidnap_run["tracked"] > 80


def test_seam_link_carries_no_inertial_factor():
    """Regression for the pre_valid seam-mask bug: _run_vi_ba must mask the
    inertial factor on `seam` links and links without a preintegration.
    An unmasked EMPTY preintegration (zero covariance -> ~1e9 information,
    imu.py information()) acts as a rigid zero-motion factor that welds the
    two chains' seam keyframes into the same pose — exactly what
    MergeInertialBA's docstring promises to prevent (Optimizer.cc:6034 welds
    via shared observations, not a fake inertial link)."""
    import types as _types
    from orb_slam3_comments_ghr_tpu.map.state import MapState, MapConfig
    from orb_slam3_comments_ghr_tpu.pipeline.mapper import LocalMapper

    mc = MapConfig(max_kf=16, max_mp=1024, n_feat=256, obs_cap=8)
    cfg = SlamConfig(n_features=256, local_ba_points=512)
    m = MapState(mc)
    mapper = LocalMapper(CAM, cfg, m)
    calib = imu_mod.ImuCalib(
        Rbc=jnp.eye(3), tbc=jnp.zeros(3),
        noise_g=1e-4, noise_a=1e-3, walk_g=1e-6, walk_a=1e-5,
    )
    mapper.imu = _types.SimpleNamespace(calib=calib, bias=np.zeros(6, np.float32))

    def feats(n=256):
        return {
            "xy": np.zeros((n, 2), np.float32), "level": np.zeros(n, np.int32),
            "angle": np.zeros(n, np.float32), "desc": np.zeros((n, 8), np.uint32),
            "valid": np.ones(n, bool), "u_right": np.full(n, -1.0, np.float32),
            "depth": np.full(n, -1.0, np.float32),
        }

    # two constant-velocity fragments along +x; seam gap of 1.0 m between
    # KF2 (end of chain A) and KF3 (start of chain B). Identity orientation,
    # camera == body. Tcw: R=I, t=-c.
    centers = [0.0, 0.1, 0.2, 1.2, 1.3, 1.4]
    rng = np.random.default_rng(9)
    kf_ids = []
    for i, cx in enumerate(centers):
        t = np.array([-cx, 0.0, 0.0], np.float32)
        kf = m.add_keyframe(np.eye(3, dtype=np.float32), t, feats(),
                            timestamp=0.5 * i, parent=kf_ids[-1] if kf_ids else -1)
        m.kf_vel[kf] = np.array([0.2, 0.0, 0.0], np.float32)
        kf_ids.append(kf)

    # each fragment observes its own exact-reprojection point cloud — no
    # cross-fragment observations, so only a (bogus) seam factor could move
    # the fragments relative to each other
    slot_ctr = {k: 0 for k in kf_ids}
    for frag, base in ((kf_ids[:3], 0.1), (kf_ids[3:], 1.3)):
        pts = rng.uniform([base - 2, -1.5, 6], [base + 2, 1.5, 10],
                          (60, 3)).astype(np.float32)
        desc = rng.integers(0, 2 ** 32, (60, 8), dtype=np.uint32)
        for j in range(60):
            kf0 = frag[0]
            slot0 = slot_ctr[kf0]
            uv0 = np.asarray(cameras.project(
                CAM, jnp.asarray((m.kf_R[kf0] @ pts[j] + m.kf_t[kf0])[None]))[0])
            m.kf_feat_xy[kf0, slot0] = uv0
            mp = m.add_map_points(pts[j][None], desc[j][None], kf0,
                                  np.array([slot0]))[0]
            slot_ctr[kf0] = slot0 + 1
            for kf in frag[1:]:
                pc = m.kf_R[kf] @ pts[j] + m.kf_t[kf]
                uv = np.asarray(cameras.project(CAM, jnp.asarray(pc[None]))[0])
                if not (0 <= uv[0] < CAM.width and 0 <= uv[1] < CAM.height):
                    continue
                slot = slot_ctr[kf]
                m.kf_feat_xy[kf, slot] = uv
                m.add_observation(int(mp), kf, slot)
                slot_ctr[kf] = slot + 1

    # consistent intra-fragment preintegrations (constant velocity: specific
    # force = -g in body frame); the seam link (chain index 2) gets none
    acc = np.tile(np.array([[0.0, 0.0, imu_mod.GRAVITY]], np.float32), (50, 1))
    gyr = np.zeros((50, 3), np.float32)
    dts = np.full((50,), 0.01, np.float32)
    for k in (kf_ids[1], kf_ids[2], kf_ids[4], kf_ids[5]):
        mapper.kf_preint[k] = imu_mod.preintegrate(
            jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dts),
            jnp.zeros(6), calib)

    pts_all = m.local_point_ids(kf_ids, cfg.local_ba_points)
    mapper._run_vi_ba(kf_ids, pts_all, iters=8, seam={2})

    def center(k):
        return -m.kf_R[k].T @ m.kf_t[k]

    gap = np.linalg.norm(center(kf_ids[3]) - center(kf_ids[2]))
    assert 0.9 < gap < 1.1, f"seam collapsed/stretched: gap={gap:.3f} (want ~1.0)"
    intra = np.linalg.norm(center(kf_ids[1]) - center(kf_ids[0]))
    assert 0.05 < intra < 0.15, intra


def test_viba2_gate():
    """With loop_requires_viba2 (the reference default), place recognition is
    disabled on inertial maps until VIBA2 (LoopClosing.cc:413)."""
    from orb_slam3_comments_ghr_tpu.pipeline.loopcloser import LoopCloser
    from orb_slam3_comments_ghr_tpu.map.state import MapState, MapConfig

    cfg = SlamConfig(sensor=IMU_MONOCULAR, n_features=64, max_kf=32,
                     max_mp=256, loop_min_kfs=1)
    m = MapState(MapConfig(max_kf=32, max_mp=256, n_feat=64))
    lc = LoopCloser(CAM, cfg, m, kfdb=None, mapper=None)
    nf = 64
    feats = {
        "xy": np.zeros((nf, 2), np.float32), "level": np.zeros(nf, np.int32),
        "angle": np.zeros(nf, np.float32), "desc": np.zeros((nf, 8), np.uint32),
        "valid": np.zeros(nf, bool), "u_right": np.full(nf, -1.0, np.float32),
        "depth": np.full(nf, -1.0, np.float32),
    }
    kf = m.add_keyframe(np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
                        feats, 0.0)
    m.map_imu_init[m.active_map] = True
    m.map_viba2[m.active_map] = False
    assert lc.process_keyframe(kf) is False
