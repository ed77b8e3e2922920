"""Probe: per-stage device cost of the realtime rt_step on TPU.

Times each jitted stage of the fused step independently (chained data
dependencies via time_device_fn) to find where the per-frame ~270 ms goes.
"""

import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from open3d_slam_private_tpu.geometry import se3
from open3d_slam_private_tpu.models import icp as icp_mod
from open3d_slam_private_tpu.ops import pointcloud as pc
from open3d_slam_private_tpu.slam import motion_compensation as mc_mod
from open3d_slam_private_tpu.slam import odometry as odo_mod
from open3d_slam_private_tpu.slam import submap as submap_mod
from open3d_slam_private_tpu.slam.mapper import (
    build_map_reference, process_scan_for_matching)
from open3d_slam_private_tpu.slam.realtime import rt_init, rt_step
from open3d_slam_private_tpu.utils.timing import time_device_fn, relay_roundtrip
from tools.probe_realtime import build_cfg, make_frames
from bench import synth_scene


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    n_pts = 8192
    scene = synth_scene(200_000)
    frames, gts = make_frames(12, n_pts, scene)
    cfg = build_cfg(n_pts)
    rt = relay_roundtrip()
    log(f"relay rt={rt*1e3:.1f}ms")

    state = rt_init(frames[0], jnp.eye(4), cfg)
    state, _ = rt_step(state, frames[1], jnp.asarray(0.1, jnp.float32),
                       jnp.eye(4), cfg)
    jax.block_until_ready(state.map_pose)
    scan = frames[2]

    # Full fused step.
    def full(s0_xyz, st, sc):
        sc = dataclasses.replace(sc, xyz=s0_xyz)
        ns, stats = rt_step(st, sc, jnp.asarray(0.1, jnp.float32),
                            jnp.eye(4), cfg)
        return stats
    t = time_device_fn(full, (scan.xyz, state, scan), iters=10)
    log(f"rt_step full: {t*1e3:.1f} ms")

    # Odometry preprocess.
    key = jax.random.key(0)
    def prep(x, sc):
        sc = dataclasses.replace(sc, xyz=x)
        return odo_mod.preprocess(sc, key, cfg.odometry).xyz
    t = time_device_fn(prep, (scan.xyz, scan), iters=10)
    log(f"odom preprocess: {t*1e3:.1f} ms")

    # Odometry registration (single problem).
    prev = odo_mod.preprocess(frames[1], key, cfg.odometry)
    curr = odo_mod.preprocess(frames[2], key, cfg.odometry)
    def odo_reg(x, cu, pr):
        cu = dataclasses.replace(cu, xyz=x)
        return icp_mod.register_pair(cu, pr, jnp.eye(4), cfg.odometry.icp).transform
    t = time_device_fn(odo_reg, (curr.xyz, curr, prev), iters=10)
    log(f"odom register_pair: {t*1e3:.1f} ms")

    # Mapper scan preprocess.
    def mprep(x, sc):
        sc = dataclasses.replace(sc, xyz=x)
        return process_scan_for_matching(sc, cfg.mapper).xyz
    t = time_device_fn(mprep, (scan.xyz, scan), iters=10)
    log(f"mapper preprocess: {t*1e3:.1f} ms")

    # Mapper icp_single.
    proc = process_scan_for_matching(scan, cfg.mapper)
    def micp(x, p, r):
        p = dataclasses.replace(p, xyz=x)
        return icp_mod.icp_single(p, r, jnp.asarray(state.map_pose), cfg.mapper.icp).transform
    t = time_device_fn(micp, (proc.xyz, proc, state.ref), iters=10)
    log(f"mapper icp_single: {t*1e3:.1f} ms")

    # Reference rebuild.
    def reb(x, bankcloud):
        bankcloud = dataclasses.replace(bankcloud, xyz=x)
        ref = build_map_reference(bankcloud, jnp.zeros(3), cfg.mapper)
        return ref.cloud.xyz
    t = time_device_fn(reb, (state.bank.cloud.xyz, state.bank.cloud), iters=10)
    log(f"reference rebuild: {t*1e3:.1f} ms")

    # Submap insert.
    def ins(x, b, p):
        p = dataclasses.replace(p, xyz=x)
        nb = submap_mod.insert_scan(b, p, jnp.asarray(state.map_pose),
                                    cfg.submaps.submap_voxel_size,
                                    cfg.submaps.submap_crop_radius)
        return nb.cloud.xyz
    t = time_device_fn(ins, (proc.xyz, state.bank, proc), iters=10)
    log(f"submap insert: {t*1e3:.1f} ms")

    # Undistortion.
    tw = jnp.asarray(np.r_[0, 0, 0.04, 0.32, 0, 0], jnp.float32)
    def und(x, sc):
        sc = dataclasses.replace(sc, xyz=x)
        return mc_mod.undistort_with_times(sc, tw, 0.0, 1.0).xyz
    t = time_device_fn(und, (scan.xyz, scan), iters=10)
    log(f"undistort: {t*1e3:.1f} ms")


if __name__ == "__main__":
    main()
