"""Consolidated round-4 TPU probe (run in background, never killed).

Sections, each printed as it completes:
 1. relay health + roundtrip
 2. honest per-stage single-problem costs (chained readbacks, no DCE):
    odometry register_pair, mapper icp_single, submap insert, rt_step
 3. chunked rt_step_chunk throughput (K=8)
 4. fused gather-select kernel vs XLA selection (B=8 @64k production chain)
 5. GICP A/B current-code baseline
"""

import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def sync(x):
    return float(jnp.sum(jnp.asarray(x).astype(jnp.float32)))


def timed_chain(fn, feedback, first, reps=10, rt=0.0):
    """fn(prev) -> out; feedback(out) -> next prev. One readback at end."""
    out = fn(first)
    sync(feedback(out))
    t0 = time.perf_counter()
    prev = feedback(out)
    for _ in range(reps):
        out = fn(prev)
        prev = feedback(out)
    sync(prev)
    return (time.perf_counter() - t0 - rt) / reps


def main():
    from open3d_slam_private_tpu.ops import pointcloud as pc
    from open3d_slam_private_tpu.slam import odometry as odo_mod
    from open3d_slam_private_tpu.slam import submap as submap_mod
    from open3d_slam_private_tpu.slam.mapper import process_scan_for_matching
    from open3d_slam_private_tpu.slam.realtime import (
        rt_init, rt_step, rt_step_chunk)
    from open3d_slam_private_tpu.models import icp as icp_mod
    from open3d_slam_private_tpu.utils.timing import relay_roundtrip
    from tools.probe_realtime import build_cfg, make_frames
    from bench import synth_scene

    t_all = time.time()
    rt = relay_roundtrip()
    log(f"S1 relay rt={rt*1e3:.1f} ms")

    n_pts = 8192
    scene = synth_scene(100_000)
    frames, _ = make_frames(40, n_pts, scene)
    cfg = build_cfg(n_pts)

    # ---- S2: per-stage single-problem costs (honest chains) ----
    key = jax.random.key(0)
    prev_p = odo_mod.preprocess(frames[0], key, cfg.odometry)
    curr_p = odo_mod.preprocess(frames[1], key, cfg.odometry)

    @jax.jit
    def odo_once(T):
        return icp_mod.register_pair(curr_p, prev_p, T, cfg.odometry.icp).transform

    t = timed_chain(odo_once, lambda T: T, jnp.eye(4), reps=10, rt=rt)
    log(f"S2 odometry register_pair (single): {t*1e3:.1f} ms")

    state = rt_init(frames[0], jnp.eye(4), cfg)
    proc = process_scan_for_matching(frames[1], cfg.mapper)

    @jax.jit
    def micp_once(T):
        return icp_mod.icp_single(proc, state.ref, T, cfg.mapper.icp).transform

    t = timed_chain(micp_once, lambda T: T, jnp.asarray(state.map_pose), reps=10, rt=rt)
    log(f"S2 mapper icp_single (single): {t*1e3:.1f} ms")

    @jax.jit
    def ins_once(bank):
        return submap_mod.insert_scan(
            bank, proc, jnp.asarray(state.map_pose),
            cfg.submaps.submap_voxel_size, cfg.submaps.submap_crop_radius)

    t = timed_chain(ins_once, lambda b: b, state.bank, reps=10, rt=rt)
    log(f"S2 submap insert (chained): {t*1e3:.1f} ms")

    @jax.jit
    def prep_once(x):
        return odo_mod.preprocess(
            dataclasses.replace(frames[2], xyz=x), key, cfg.odometry).xyz

    t = timed_chain(prep_once, lambda x: frames[2].xyz + 0.0 * x[:n_pts].sum(),
                    frames[2].xyz, reps=10, rt=rt)
    log(f"S2 odometry preprocess: {t*1e3:.1f} ms")

    dt0 = jnp.asarray(0.1, jnp.float32)
    eye = jnp.eye(4)

    def rt_once(st):
        st2, stats = rt_step(st, frames[3], dt0, eye, cfg)
        return st2

    t = timed_chain(rt_once, lambda s: s, state, reps=10, rt=rt)
    log(f"S2 rt_step full (chained state): {t*1e3:.1f} ms")

    # ---- S3: chunked throughput ----
    K = 8
    dts = jnp.full((K,), 0.1, jnp.float32)
    exts = jnp.tile(jnp.eye(4), (K, 1, 1))
    chunks = [pc.stack(frames[1 + i * K:1 + (i + 1) * K]) for i in range(4)]
    st = state
    st, out = rt_step_chunk(st, chunks[0], dts, exts, cfg)
    sync(out)
    log("S3 chunk warm")
    t0 = time.perf_counter()
    for c in chunks[1:4]:
        st, out = rt_step_chunk(st, c, dts, exts, cfg)
    sync(out)
    per = (time.perf_counter() - t0 - rt) / (3 * K)
    log(f"S3 chunked K={K}: {per*1e3:.1f} ms/frame ({1.0/per:.1f} Hz)")

    # ---- S4: gather-select kernel in the production 64k chain ----
    from bench import sample_scan
    from open3d_slam_private_tpu.geometry import se3
    from open3d_slam_private_tpu.models.localizability import DegeneracyConfig
    from open3d_slam_private_tpu.ops import grid_hash, voxel
    from open3d_slam_private_tpu.ops import normals as normals_mod

    N_READ, MAP_CAP, B = 65536, 131072, 8
    scene_big = synth_scene(400_000)
    submap = pc.from_points(scene_big, capacity=512 * 1024)
    submap = voxel.voxel_downsample(submap, 0.15, capacity=MAP_CAP)
    ngrid = grid_hash.build_grid(submap.padded_xyz(), submap.mask, 1.0, 1 << 17, 32)
    submap = normals_mod.estimate_normals_grid(
        submap, ngrid, knn=8, max_dist=0.5, orient_towards=(0.0, 0.0, 20.0))
    xicp_cfg = icp_mod.ICPConfig(
        knn=1, max_match_dist=0.5, matcher="grid",
        grid_table_size=1 << 17, grid_bucket_cap=48,
        trimmed_ratio=0.9, minimizer="point_to_plane",
        max_iterations=10, min_diff_rot=1e-3, min_diff_trans=8e-3,
        coarse_iterations=20, coarse_stride=8,
        candidate_refresh_every=10, candidate_slack=0.25,
        fused_kernel=True, fast_trimming=True,
        degeneracy=DegeneracyConfig(
            method="optimized", enough_information_threshold=250.0,
            insufficient_information_threshold=180.0),
    )
    ref_x = icp_mod.build_reference(submap, xicp_cfg)
    T_trues, scans = [], []
    for i in range(B):
        twist = np.array([0.01, -0.008, 0.012, 0.08, -0.05, 0.03], np.float32) * (1 + 0.1 * i)
        T_true = se3.exp_se3(jnp.asarray(twist))
        scans.append(pc.from_points(
            sample_scan(scene_big, N_READ, se3.transform_inverse(T_true), seed=i),
            capacity=N_READ))
        T_trues.append(np.asarray(T_true))
    readings = pc.stack(scans)
    perturb = jnp.asarray(se3.exp_se3(
        jnp.asarray([0.012, -0.008, 0.015, 0.06, 0.05, -0.06], jnp.float32)))
    init_Ts = jnp.asarray(np.stack([T @ np.asarray(perturb) for T in T_trues]))

    def make_round(c):
        @jax.jit
        def f(reads, reference, Ts):
            res = jax.vmap(lambda r, T: icp_mod.icp_single(r, reference, T, c))(reads, Ts)
            return res.transform @ perturb, res.iterations
        return f

    for name, c in [
        ("xla", xicp_cfg),
        ("gather_kernel", dataclasses.replace(xicp_cfg, gather_kernel=True)),
    ]:
        f = make_round(c)
        warm, _ = f(readings, ref_x, init_Ts)
        sync(warm)
        log(f"S4 {name} warm")
        prev = warm
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(3):
                prev, iters = f(readings, ref_x, prev)
            sync(prev)
            ts.append((time.perf_counter() - t0 - rt) / 3)
        med = float(np.median(ts))
        out_T = np.asarray(prev @ jnp.linalg.inv(perturb))
        errs = [float(np.linalg.norm(np.linalg.inv(out_T[i]) @ T_trues[i] - np.eye(4)))
                for i in range(B)]
        log(f"S4 {name}: {B/med:.1f} reg/s  mean_iters={float(np.mean(np.asarray(iters))):.1f} "
            f"maxTerr~{max(errs):.4f}")

    # ---- S5: GICP current-code baseline ----
    gicp_cfg = dataclasses.replace(
        xicp_cfg, minimizer="gicp", fused_kernel=False,
        degeneracy=DegeneracyConfig(method="none"))
    gicp_ref = icp_mod.build_reference(submap, gicp_cfg)
    gicp_scans = []
    for s in scans:
        gg = grid_hash.build_grid(s.padded_xyz(), s.mask, 0.5, 1 << 16, 32)
        gicp_scans.append(normals_mod.estimate_normals_grid(s, gg, knn=8, max_dist=0.5))
    gicp_reads = pc.stack(gicp_scans)

    @jax.jit
    def gicp_round(reads, reference, Ts):
        res = jax.vmap(lambda r, T: icp_mod.icp_single(r, reference, T, gicp_cfg))(reads, Ts)
        return res.transform @ perturb

    warm = gicp_round(gicp_reads, gicp_ref, init_Ts)
    sync(warm)
    prev = warm
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(2):
            prev = gicp_round(gicp_reads, gicp_ref, prev)
        sync(prev)
        ts.append((time.perf_counter() - t0 - rt) / 2)
    log(f"S5 gicp: {B/float(np.median(ts)):.1f} reg/s")
    log(f"done in {time.time()-t_all:.0f}s")


if __name__ == "__main__":
    main()
