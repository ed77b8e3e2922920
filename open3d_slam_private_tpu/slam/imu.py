"""IMU buffering and initial-attitude estimation.

Analogue of the reference's ``ImuBuffer`` + ``ImuSignalLowPassFilter``
(``ros/open3d_slam_ros/src/ImuBuffer.cpp``): a bounded time-ordered buffer
of (acc, gyro) samples with

- exponential low-pass filtering of the acceleration signal,
- initial roll/pitch attitude from the gravity direction while stationary
  (``estimateAttitudeFromImu``, ``ImuBuffer.cpp:102``),
- gravity-magnitude and gyro-bias estimation over a still window,
- interpolated angular-velocity lookup for motion compensation.

Host-side control-plane state, like the transform buffer.
"""

from __future__ import annotations

import bisect
import threading
from typing import List, Optional, Tuple

import numpy as np


class ImuSignalLowPassFilter:
    """First-order exponential low-pass (≙ ImuSignalLowPassFilter)."""

    def __init__(self, cutoff_hz: float = 5.0, sample_rate_hz: float = 200.0):
        rc = 1.0 / (2.0 * np.pi * cutoff_hz)
        dt = 1.0 / sample_rate_hz
        self.alpha = dt / (rc + dt)
        self._state: Optional[np.ndarray] = None

    def filter(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, np.float64)
        if self._state is None:
            self._state = x.copy()
        else:
            self._state = self._state + self.alpha * (x - self._state)
        return self._state.copy()

    def reset(self) -> None:
        self._state = None


class ImuBuffer:
    """Bounded time-ordered IMU sample buffer."""

    def __init__(self, size_limit: int = 4000, lowpass: Optional[ImuSignalLowPassFilter] = None):
        self._times: List[float] = []
        self._acc: List[np.ndarray] = []
        self._gyro: List[np.ndarray] = []
        self._limit = size_limit
        self._lock = threading.Lock()
        self._lowpass = lowpass

    def push(self, time: float, acc, gyro) -> None:
        acc = np.asarray(acc, np.float64)
        if self._lowpass is not None:
            acc = self._lowpass.filter(acc)
        with self._lock:
            idx = bisect.bisect_right(self._times, time)
            self._times.insert(idx, time)
            self._acc.insert(idx, acc)
            self._gyro.insert(idx, np.asarray(gyro, np.float64))
            while len(self._times) > self._limit:
                self._times.pop(0)
                self._acc.pop(0)
                self._gyro.pop(0)

    def __len__(self) -> int:
        return len(self._times)

    def _window(self, t_start: Optional[float], t_end: Optional[float]):
        lo = 0 if t_start is None else bisect.bisect_left(self._times, t_start)
        hi = len(self._times) if t_end is None else bisect.bisect_right(self._times, t_end)
        return lo, hi

    def estimate_attitude(
        self, t_start: Optional[float] = None, t_end: Optional[float] = None
    ) -> Tuple[np.ndarray, float]:
        """Initial attitude from gravity while (near-)stationary.

        Returns (R_world_body ``[3,3]`` with roll/pitch aligned so gravity
        maps to -z and yaw = 0, gravity magnitude). ≙
        ``ImuBuffer::estimateAttitudeFromImu``.
        """
        with self._lock:
            lo, hi = self._window(t_start, t_end)
            if hi - lo < 2:
                raise ValueError("not enough IMU samples for attitude estimation")
            acc = np.mean(np.stack(self._acc[lo:hi]), axis=0)
        g = np.linalg.norm(acc)
        if g < 1e-6:
            raise ValueError("degenerate accelerometer mean")
        up = acc / g  # body-frame direction opposing gravity
        # Yaw-free tilt: the (minimal) rotation taking body-up onto world +z.
        ez = np.array([0.0, 0.0, 1.0])
        v = np.cross(up, ez)
        s = np.linalg.norm(v)
        c = float(np.dot(up, ez))
        if s < 1e-12:
            R_world_body = np.eye(3) if c > 0 else np.diag([1.0, -1.0, -1.0])
        else:
            K = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
            R_world_body = np.eye(3) + K + K @ K * ((1 - c) / (s * s))
        return R_world_body, float(g)

    def estimate_gyro_bias(
        self, t_start: Optional[float] = None, t_end: Optional[float] = None
    ) -> np.ndarray:
        """Mean angular rate over a still window (gyro bias)."""
        with self._lock:
            lo, hi = self._window(t_start, t_end)
            if hi - lo < 1:
                raise ValueError("not enough IMU samples for bias estimation")
            return np.mean(np.stack(self._gyro[lo:hi]), axis=0)

    def angular_velocity(self, time: float) -> np.ndarray:
        """Interpolated angular rate at ``time`` (for undistortion)."""
        with self._lock:
            if not self._times:
                raise LookupError("empty IMU buffer")
            if time <= self._times[0]:
                return self._gyro[0].copy()
            if time >= self._times[-1]:
                return self._gyro[-1].copy()
            hi = bisect.bisect_right(self._times, time)
            lo = hi - 1
            t0, t1 = self._times[lo], self._times[hi]
            a = 0.0 if t1 == t0 else (time - t0) / (t1 - t0)
            return (1 - a) * self._gyro[lo] + a * self._gyro[hi]
