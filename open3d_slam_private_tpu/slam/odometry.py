"""Scan-to-scan LiDAR odometry.

Analogue of the reference ``LidarOdometry`` (``Odometry.cpp``): preprocess
(crop -> voxelize -> normals -> downsample, ``Odometry.cpp:22-27``), register
the new scan against the previous one, accumulate the cumulative pose.
Falls back to the last relative motion when fitness is poor
(``Odometry.cpp:56-71``).

The device step is one jitted function over fixed shapes; the host keeps the
tiny control state (cumulative pose, last motion).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from open3d_slam_private_tpu.models import icp as icp_mod
from open3d_slam_private_tpu.ops import filters
from open3d_slam_private_tpu.ops import normals as normals_mod
from open3d_slam_private_tpu.ops import pointcloud as pc
from open3d_slam_private_tpu.ops.voxel import voxel_downsample


@dataclasses.dataclass(frozen=True)
class OdometryConfig:
    """≙ ``OdometryParameters`` (crop + voxel + downsample + ICP knobs)."""

    min_range: float = 1.0
    max_range: float = 60.0
    voxel_size: float = 0.3
    max_points: int = 16384
    normals_knn: int = 8
    normals_radius: float = 1.0
    # The "hash" matcher (cheap per-cell bucket build: one argsort + one
    # scatter) instead of the cell list: odometry rebuilds the reference
    # EVERY scan and queries it only ~4 times (candidate caching), so build
    # cost dominates — measured 74 -> 13 ms/scan on v5e at 32k raw points.
    icp: icp_mod.ICPConfig = dataclasses.field(
        default_factory=lambda: icp_mod.ICPConfig(
            knn=1,
            max_match_dist=1.0,
            matcher="hash",
            grid_table_size=1 << 13,
            grid_bucket_cap=48,
            trimmed_ratio=0.8,
            minimizer="point_to_plane",
            max_iterations=20,
            min_diff_rot=1e-3,
            min_diff_trans=1e-3,
            candidate_refresh_every=5,
            fast_trimming=True,
            fused_kernel=True,  # falls back to XLA off-TPU
        )
    )
    min_fitness: float = 0.1  # ≙ Odometry.cpp:56 fitness gate


@functools.partial(jax.jit, static_argnames=("cfg",))
def preprocess(scan: pc.PointBatch, key: jax.Array, cfg: OdometryConfig) -> pc.PointBatch:
    """crop -> voxel -> normals -> cap point count (``Odometry.cpp:22-27``)."""
    s = filters.min_max_radius(scan, cfg.min_range, cfg.max_range)
    # Sensor-origin retention priority: graceful far-band shedding under
    # capacity pressure (see mapper.process_scan_for_matching).
    s = voxel_downsample(
        s, cfg.voxel_size, capacity=cfg.max_points,
        priority_center=jnp.zeros(3, s.xyz.dtype),
    )
    s = normals_mod.estimate_normals(
        s, knn=cfg.normals_knn, max_dist=cfg.normals_radius,
        orient_towards=(0.0, 0.0, 0.0),
    )
    return s


@functools.partial(jax.jit, static_argnames=("cfg",))
def odometry_step(
    prev: pc.PointBatch,
    curr: pc.PointBatch,
    init_T: jax.Array,
    cfg: OdometryConfig,
) -> icp_mod.ICPResult:
    """Register curr (reading) against prev (reference). Both preprocessed."""
    return icp_mod.register_pair(curr, prev, init_T, cfg.icp)


class LidarOdometry:
    """Host wrapper holding cumulative state (≙ ``LidarOdometry`` object)."""

    def __init__(self, cfg: Optional[OdometryConfig] = None, seed: int = 0):
        self.cfg = cfg or OdometryConfig()
        self._key = jax.random.key(seed)
        self._prev: Optional[pc.PointBatch] = None
        self._pose = np.eye(4, dtype=np.float64)
        self._last_motion = np.eye(4, dtype=np.float64)

    @property
    def pose(self) -> np.ndarray:
        return self._pose.copy()

    def add_scan(self, scan: pc.PointBatch) -> np.ndarray:
        """Process one scan; returns the cumulative odometry pose."""
        self._key, sub = jax.random.split(self._key)
        processed = preprocess(scan, sub, self.cfg)
        if self._prev is None:
            self._prev = processed
            return self.pose
        init = jnp.asarray(self._last_motion, jnp.float32)
        res = odometry_step(self._prev, processed, init, self.cfg)
        ok = (
            bool(res.overlap_ratio >= self.cfg.min_fitness)
            and bool(jnp.all(jnp.isfinite(res.transform)))
        )
        motion = np.asarray(res.transform, np.float64) if ok else self._last_motion
        self._pose = self._pose @ motion
        self._last_motion = motion
        self._prev = processed
        return self.pose
