"""Round-4 TPU probe #2: rebuild-path costs after the rebuild rewrite,
plus the sections the first consolidated probe crashed before reaching.

Sections (each printed as it completes; run detached, never killed):
 1. relay health + roundtrip
 2. NEW map-reference rebuild breakdown @131k bank -> 64k ref:
    compact_nearest, build_grid, moment normals, cell-list build (new
    single-sort), full build_map_reference (vs the 801 ms round-3 cost)
 3. chained rt_step per-frame cost (30 steps, rebuilds included) + chunked
 4. fused gather-select kernel vs XLA selection (B=8 @64k production chain)
 5. GICP A/B current-code baseline (the 305->273 regression hunt)
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
    leaves = [l for l in jax.tree_util.tree_leaves(x)
              if hasattr(l, "dtype")]
    return float(sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) if l.dtype != jnp.bool_
                     else jnp.sum(l) for l in leaves[:4]))


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
    from open3d_slam_private_tpu.ops import cell_list as cell_mod
    from open3d_slam_private_tpu.ops import grid_hash, voxel
    from open3d_slam_private_tpu.ops import normals as normals_mod
    from open3d_slam_private_tpu.slam import submap as submap_mod
    from open3d_slam_private_tpu.slam.mapper import (
        build_map_reference, compact_nearest, process_scan_for_matching)
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
    mcfg = cfg.mapper

    # Fill a realistic 131k bank by inserting a bunch of frames.
    state = rt_init(frames[0], jnp.eye(4), cfg)
    bank = state.bank
    for i in range(1, 20):
        proc = process_scan_for_matching(frames[i], mcfg)
        T = jnp.eye(4, dtype=jnp.float32).at[0, 3].set(0.5 * i)
        bank = submap_mod.insert_scan(
            bank, proc, T, cfg.submaps.submap_voxel_size,
            cfg.submaps.submap_crop_radius)
    occ = int(jnp.sum(bank.cloud.mask))
    center = jnp.zeros(3, jnp.float32).at[0].set(5.0)
    log(f"S2 bank occ={occ}/{bank.cloud.capacity}")

    rc = mcfg.ref_capacity or bank.cloud.capacity

    @jax.jit
    def comp_once(cl):
        return compact_nearest(cl, center, rc)

    t = timed_chain(comp_once, lambda p: bank.cloud, bank.cloud, reps=10, rt=rt)
    log(f"S2 compact_nearest 131k->{rc}: {t*1e3:.1f} ms")

    patch = compact_nearest(bank.cloud, center, rc)

    @jax.jit
    def grid_once(p):
        return grid_hash.build_grid(
            p.padded_xyz(), p.mask, 2.0 * mcfg.normals_radius,
            mcfg.icp.grid_table_size, 32)

    t = timed_chain(grid_once, lambda g: patch, patch, reps=10, rt=rt)
    log(f"S2 build_grid @{rc}: {t*1e3:.1f} ms")

    ngrid = grid_once(patch)

    @jax.jit
    def mom_once(p):
        return normals_mod.estimate_normals_moments(
            p, ngrid, max_dist=mcfg.normals_radius, orient_towards=center)

    t = timed_chain(mom_once, lambda p: patch, patch, reps=10, rt=rt)
    log(f"S2 moment normals @{rc}: {t*1e3:.1f} ms")

    withn = mom_once(patch)

    @jax.jit
    def cell_once(p):
        return cell_mod.build_cell_list(
            p.padded_xyz(), p.mask, mcfg.icp.max_match_dist + 0.25,
            table_size=mcfg.icp.grid_table_size,
            list_cap=mcfg.icp.grid_bucket_cap, normals=p.normals)

    t = timed_chain(cell_once, lambda c: withn, withn, reps=10, rt=rt)
    log(f"S2 cell-list build (new single-sort) @{rc}: {t*1e3:.1f} ms")

    @jax.jit
    def full_once(cl):
        return build_map_reference(cl, center, mcfg)

    t = timed_chain(full_once, lambda r: bank.cloud, bank.cloud, reps=10, rt=rt)
    log(f"S2 FULL build_map_reference @131k bank: {t*1e3:.1f} ms (was 801)")

    # ---- S3: chained realtime per-frame (includes rebuild cadence) ----
    dt0 = jnp.asarray(0.1, jnp.float32)
    eye = jnp.eye(4)

    def rt_once(st):
        st2, stats = rt_step(st, frames[3], dt0, eye, cfg)
        return st2

    st2 = rt_once(state)
    sync(st2.map_pose)
    t0 = time.perf_counter()
    st = st2
    for i in range(30):
        st, _ = rt_step(st, frames[4 + (i % 30)], dt0, eye, cfg)
    sync(st.map_pose)
    per = (time.perf_counter() - t0 - rt) / 30
    log(f"S3 30 chained rt_steps: {per*1e3:.1f} ms/frame ({1.0/per:.1f} Hz) (was 119)")

    K = 8
    dts = jnp.full((K,), 0.1, jnp.float32)
    exts = jnp.tile(jnp.eye(4), (K, 1, 1))
    chunks = [pc.stack(frames[1 + i * K:1 + (i + 1) * K]) for i in range(4)]
    st, out = rt_step_chunk(state, chunks[0], dts, exts, cfg)
    sync(out)
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

    N_READ, MAP_CAP, B = 65536, 131072, 8
    scene_big = synth_scene(400_000)
    submap = pc.from_points(scene_big, capacity=512 * 1024)
    submap = voxel.voxel_downsample(submap, 0.15, capacity=MAP_CAP)
    sgrid = grid_hash.build_grid(submap.padded_xyz(), submap.mask, 1.0, 1 << 16, 32)
    submap = normals_mod.estimate_normals_moments(
        submap, sgrid, max_dist=0.5, orient_towards=(0.0, 0.0, 20.0))
    xicp_cfg = icp_mod.ICPConfig(
        knn=1, max_match_dist=0.5, matcher="grid",
        grid_table_size=1 << 16, grid_bucket_cap=48,
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
        try:
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
        except Exception as e:
            log(f"S4 {name} FAILED: {type(e).__name__}: {e}")

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
