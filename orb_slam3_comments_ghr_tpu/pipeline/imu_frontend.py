"""IMU bookkeeping for the tracking front end.

Mirrors the reference's per-frame IMU plumbing: the sample queue
(Tracking::GrabImuData, Tracking.cc:1762), the dual preintegration — from the
last keyframe AND from the last frame (PreintegrateIMU, Tracking.cc:1771) —
and keyframe-boundary resets (CreateNewKeyFrame resets the from-KF
accumulator, Tracking.cc:3935)."""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..optim import imu as imu_mod

SAMPLE_CAP = 256  # baseline padded capacity; long keyframe gaps grow it in
                  # power-of-two buckets so jit re-traces stay bounded


class ImuFrontend:
    def __init__(self, calib: imu_mod.ImuCalib):
        self.calib = calib
        self.queue: list[np.ndarray] = []  # rows [t, ax, ay, az, wx, wy, wz]
        self.bias = np.zeros(6, np.float32)
        # raw samples since the last keyframe (for full-raw reintegration at
        # keyframe creation and preintegration merging)
        self._since_kf: list[np.ndarray] = []
        self.last_frame_time: Optional[float] = None
        # incremental from-KF accumulator (mpImuPreintegratedFromLastKF):
        # per-frame chunks are integrated ON TOP of this instead of rescanning
        # every sample since the keyframe each frame
        self._pre_kf: Optional[imu_mod.Preintegrated] = None
        self._pre_kf_bias: Optional[np.ndarray] = None

    def feed(self, samples: np.ndarray):
        """samples: (M, 7) [t, ax, ay, az, wx, wy, wz]."""
        for row in np.atleast_2d(np.asarray(samples, np.float64)):
            self.queue.append(row)

    def _take_until(self, t: float) -> list[np.ndarray]:
        out = []
        while self.queue and self.queue[0][0] <= t:
            out.append(self.queue.pop(0))
        return out

    def preintegrate_frame(self, t_frame: float) -> Optional[imu_mod.Preintegrated]:
        """Consume samples up to t_frame; returns the preintegration from the
        last frame (None on the first call). The same chunk is also folded
        into the incremental from-KF accumulator (dual preintegration,
        Tracking.cc:1883)."""
        rows = self._take_until(t_frame)
        self._since_kf.extend(rows)
        if self.last_frame_time is None:
            self.last_frame_time = t_frame
            return None
        acc, gyr, dts = self._chunk(rows, self.last_frame_time, t_frame)
        pre = imu_mod.preintegrate(
            jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dts),
            jnp.asarray(self.bias), self.calib,
        )
        if (self._pre_kf_bias is not None
                and np.array_equal(self._pre_kf_bias, self.bias)):
            if self._pre_kf is None:
                # first chunk after on_new_keyframe: the per-frame chunk IS
                # the from-KF preintegration (the KF was created at the
                # previous frame time), so it seeds the accumulator
                self._pre_kf = pre
            else:
                self._pre_kf = imu_mod.preintegrate_continue(
                    self._pre_kf, jnp.asarray(acc), jnp.asarray(gyr),
                    jnp.asarray(dts), self.calib,
                )
        else:
            self._pre_kf = None  # bias changed: lazily rebuilt from raw rows
        self.last_frame_time = t_frame
        return pre

    def preintegrate_since_kf(self, t_kf_prev: float, t_frame: float,
                              with_raw: bool = False):
        """Preintegration spanning [t_kf_prev, t_frame]. The fast path returns
        the incremental accumulator (O(frame-gap) per frame); with_raw=True
        (keyframe creation) reintegrates from the stored raw rows so the
        result carries the full sample history for later merging."""
        if (not with_raw and self._pre_kf is not None
                and np.array_equal(self._pre_kf_bias, self.bias)
                and self.last_frame_time is not None
                and abs(self.last_frame_time - t_frame) < 1e-9):
            return self._pre_kf
        full = self._integrate(self._since_kf, t_kf_prev, t_frame)
        if (self.last_frame_time is not None
                and abs(self.last_frame_time - t_frame) < 1e-9):
            self._pre_kf = full
            self._pre_kf_bias = np.asarray(self.bias).copy()
        return full

    def on_new_keyframe(self, t_kf: float | None = None):
        """Reset the from-KF accumulator at keyframe creation.

        In the DEEP PIPELINE (system.track_*_pipelined) the keyframe's frame
        time is `pipeline_depth` frames behind the IMU head: rows newer than
        t_kf belong to the NEXT inter-KF interval and must be retained, and
        the incremental accumulator is rebuilt over (t_kf, head] so the
        per-frame fast path stays correct. Synchronous callers (or t_kf
        omitted) get the plain reset."""
        if (t_kf is None or self.last_frame_time is None
                or self.last_frame_time <= t_kf + 1e-12):
            self._since_kf = []
            self._pre_kf = None
            self._pre_kf_bias = np.asarray(self.bias).copy()
            return
        self._since_kf = [r for r in self._since_kf if r[0] > t_kf]
        self._pre_kf_bias = np.asarray(self.bias).copy()
        self._pre_kf = self._integrate(
            self._since_kf, t_kf, self.last_frame_time)

    def _chunk(self, rows, t0: float, t1: float, cap_min: int = 32):
        """Padded (acc, gyr, dts) arrays over [t0, t1] with a hold-to-t1 tail.
        Capacity grows in power-of-two buckets so every sample is kept (long
        keyframe gaps) while jit shape buckets stay bounded."""
        cap = cap_min
        while cap < len(rows) + 1:
            cap *= 2
        acc = np.zeros((cap, 3), np.float32)
        gyr = np.zeros((cap, 3), np.float32)
        dts = np.zeros((cap,), np.float32)
        prev_t = t0
        n = 0
        for row in rows:
            t = min(max(row[0], t0), t1)
            dt = t - prev_t
            if dt <= 0:
                continue
            acc[n] = row[1:4]
            gyr[n] = row[4:7]
            dts[n] = dt
            prev_t = t
            n += 1
        # tail: hold the last sample to the frame time
        if n > 0 and prev_t < t1:
            acc[n] = acc[n - 1]
            gyr[n] = gyr[n - 1]
            dts[n] = t1 - prev_t
            n += 1
        return acc, gyr, dts

    def _integrate(self, rows, t0: float, t1: float) -> imu_mod.Preintegrated:
        acc, gyr, dts = self._chunk(rows, t0, t1, cap_min=SAMPLE_CAP)
        return imu_mod.preintegrate(
            jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dts),
            jnp.asarray(self.bias), self.calib,
        )
