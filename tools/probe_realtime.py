"""Probe: RealtimePipeline throughput/latency on the real TPU.

Measures the round-4 realtime architecture against the round-3 offline
numbers (0.83 Hz mapper, p50 447 ms @ 8k pts): frames/s at poll_every=8
(throughput mode) and per-scan wall at poll_every=1 (paced latency mode).
"""

import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import run_pipeline_bench, synth_scene  # reuse generators
from open3d_slam_private_tpu.geometry import se3
from open3d_slam_private_tpu.models import icp as icp_mod
from open3d_slam_private_tpu.models.localizability import DegeneracyConfig
from open3d_slam_private_tpu.ops import pointcloud as pc
from open3d_slam_private_tpu.slam.mapper import MapperConfig
from open3d_slam_private_tpu.slam.odometry import OdometryConfig
from open3d_slam_private_tpu.slam.pipeline import (
    MotionCompensationConfig, SlamConfig)
from open3d_slam_private_tpu.slam.realtime import RealtimePipeline
from open3d_slam_private_tpu.slam.submap_collection import SubmapCollectionConfig


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def build_cfg(n_pts):
    icp_map = dataclasses.replace(
        icp_mod.ICPConfig(
            knn=1, max_match_dist=1.0, matcher="grid",
            grid_table_size=1 << 14, grid_bucket_cap=64,
            trimmed_ratio=0.85, minimizer="point_to_plane",
            max_iterations=12, coarse_iterations=8, coarse_stride=4,
            candidate_refresh_every=6, candidate_slack=0.25,
            fused_kernel=True, fast_trimming=True,
        ),
        degeneracy=DegeneracyConfig(method="optimized",
                                    enough_information_threshold=250.0,
                                    insufficient_information_threshold=180.0),
    )
    return SlamConfig(
        odometry=OdometryConfig(voxel_size=0.2, max_range=40.0),
        mapper=MapperConfig(icp=icp_map, scan_voxel_size=0.1,
                            submap_voxel_size=0.15,
                            min_movement_for_insertion=0.05),
        submaps=SubmapCollectionConfig(
            submap_capacity=1 << 17, submap_voxel_size=0.15,
            creation_radius=12.0, activation_radius=14.0, carve_every_n=0),
        motion_compensation=MotionCompensationConfig(enabled=True, scan_duration=0.1),
        use_imu_attitude_init=False,
        loop_closure_enabled=True,
        use_external_odometry=False,
    )


def make_frames(n_frames, n_pts, scene):
    from bench import _frames_for_run

    return _frames_for_run(scene, n_frames, n_pts, speed=0.32, yaw=0.04)


def run(n_frames, n_pts, poll_every, h2d_mode="pytree"):
    log(f"building {n_frames} frames @ {n_pts} pts")
    scene = synth_scene(200_000)
    frames, gts = make_frames(n_frames, n_pts, scene)
    cfg = build_cfg(n_pts)
    rt = RealtimePipeline(cfg, poll_every=poll_every, h2d_mode=h2d_mode)
    log("warming critical-path programs")
    rt.warmup(frames[0])
    log("warm; streaming")
    lats = []
    t0_all = time.perf_counter()
    for i, f in enumerate(frames):
        t0 = time.perf_counter()
        rt.process_scan(f, time=0.1 * i)
        lats.append(time.perf_counter() - t0)
        if i == 9:
            log(f"warm 10 frames in {time.perf_counter()-t0_all:.0f}s")
    rt.poll()
    wall = time.perf_counter() - t0_all
    rt.finish()
    traj = rt.trajectory()
    T_align = gts[0] @ np.linalg.inv(traj[0])
    ate = [np.linalg.norm((np.linalg.inv(T_align @ e) @ g)[:3, 3])
           for e, g in zip(traj, gts)]
    core = np.asarray(lats[15:])
    log(
        f"poll_every={poll_every}: hz={1.0/np.mean(core):.2f} "
        f"p50={np.percentile(core,50)*1e3:.1f}ms p95={np.percentile(core,95)*1e3:.1f}ms "
        f"submaps={len(rt.submaps.submaps)} lc={rt.loop_closure_count} "
        f"ate_p50={np.median(ate):.4f} ate_max={np.max(ate):.4f} wall={wall:.1f}s"
    )


if __name__ == "__main__":
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    n_pts = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    poll = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    mode = sys.argv[4] if len(sys.argv) > 4 else "pytree"
    run(n_frames, n_pts, poll, mode)
