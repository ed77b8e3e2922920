"""Time-indexed transform buffer (host side).

Analogue of the reference's ``TransformInterpolationBuffer``
(``TransformInterpolationBuffer.cpp``): a bounded, time-ordered buffer of
stamped SE(3) poses with interpolated lookup (slerp rotation + lerp
translation). Lives on the host — it's control-plane state consumed by the
streaming pipeline; the per-point interpolation used for undistortion runs
on device (see motion_compensation).
"""

from __future__ import annotations

import bisect
import threading
from typing import List, Optional, Tuple

import numpy as np

from scipy.spatial.transform import Rotation as _R


def _slerp(q0, q1, alpha):
    rots = _R.from_quat([q0, q1])
    from scipy.spatial.transform import Slerp

    return Slerp([0.0, 1.0], rots)([alpha]).as_quat()[0]


class TransformInterpolationBuffer:
    """Bounded time->pose buffer. Thread-safe (the reference guards it with
    an atomic + caller mutexes; we use one lock)."""

    def __init__(self, size_limit: int = 2000):
        self._times: List[float] = []
        self._poses: List[np.ndarray] = []
        self._limit = size_limit
        self._lock = threading.Lock()

    def push(self, time: float, pose: np.ndarray) -> None:
        """Insert a stamped pose; out-of-order inserts keep time ordering
        (the reference asserts monotonicity; we tolerate and sort-insert)."""
        pose = np.asarray(pose, np.float64).reshape(4, 4)
        with self._lock:
            idx = bisect.bisect_right(self._times, time)
            self._times.insert(idx, time)
            self._poses.insert(idx, pose.copy())
            while len(self._times) > self._limit:
                self._times.pop(0)
                self._poses.pop(0)

    def __len__(self) -> int:
        return len(self._times)

    @property
    def earliest_time(self) -> Optional[float]:
        return self._times[0] if self._times else None

    @property
    def latest_time(self) -> Optional[float]:
        return self._times[-1] if self._times else None

    def has(self, time: float) -> bool:
        return bool(self._times) and self._times[0] <= time <= self._times[-1]

    def lookup(self, time: float) -> np.ndarray:
        """Interpolated pose at ``time``; clamps to the buffer ends
        (the reference throws outside the range; clamping is safer for the
        async pipeline and equals its behaviour after the has() guard)."""
        with self._lock:
            if not self._times:
                raise LookupError("empty transform buffer")
            if time <= self._times[0]:
                return self._poses[0].copy()
            if time >= self._times[-1]:
                return self._poses[-1].copy()
            hi = bisect.bisect_right(self._times, time)
            lo = hi - 1
            t0, t1 = self._times[lo], self._times[hi]
            alpha = 0.0 if t1 == t0 else (time - t0) / (t1 - t0)
            return interpolate_pose(self._poses[lo], self._poses[hi], alpha)

    def latest(self) -> np.ndarray:
        with self._lock:
            if not self._poses:
                raise LookupError("empty transform buffer")
            return self._poses[-1].copy()

    def motion_between(self, t0: float, t1: float) -> np.ndarray:
        """Relative motion pose(t0)^-1 . pose(t1) — the odometry prior used
        by the mapper (``Mapper.cpp:248-260``)."""
        a = self.lookup(t0)
        b = self.lookup(t1)
        return np.linalg.inv(a) @ b

    def clear(self) -> None:
        with self._lock:
            self._times.clear()
            self._poses.clear()


def interpolate_pose(T0: np.ndarray, T1: np.ndarray, alpha: float) -> np.ndarray:
    """Host-side slerp+lerp between 4x4 poses."""
    q0 = _R.from_matrix(T0[:3, :3]).as_quat()
    q1 = _R.from_matrix(T1[:3, :3]).as_quat()
    q = _slerp(q0, q1, float(np.clip(alpha, 0.0, 1.0)))
    out = np.eye(4)
    out[:3, :3] = _R.from_quat(q).as_matrix()
    out[:3, 3] = (1 - alpha) * T0[:3, 3] + alpha * T1[:3, 3]
    return out
