"""GICP cross-round A/B probe (round-4 item: explain the 305 -> 273 reg/s
round-2 -> round-3 delta).

Runs ONLY the bench's GICP scan-to-map section against a given repo
checkout (``--repo`` defaults to this one) and prints one number. Alternate
invocations against the round-2 worktree and HEAD (A-B-A-B) to separate a
code regression from the relay's documented ±30% process-to-process
variance:

    git worktree add /tmp/r2repo 1c8190d
    for i in 1 2 3; do
      timeout 600 python tools/gicp_ab.py --repo /tmp/r2repo
      timeout 600 python tools/gicp_ab.py --repo /root/repo
    done
"""

import argparse
import dataclasses
import os
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default="/root/repo")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--inner", type=int, default=2)
    args = ap.parse_args()

    sys.path.insert(0, args.repo)
    import jax
    import jax.numpy as jnp

    from open3d_slam_private_tpu.geometry import se3
    from open3d_slam_private_tpu.models import icp as icp_mod
    from open3d_slam_private_tpu.ops import grid_hash
    from open3d_slam_private_tpu.ops import normals as normals_mod
    from open3d_slam_private_tpu.ops import pointcloud as pc
    from open3d_slam_private_tpu.ops import voxel

    # Same scene/sampler as bench.py (duplicated numerically so the probe
    # runs identically against old checkouts whose bench.py differs).
    def synth_scene(n_ref, seed=0):
        rng = np.random.default_rng(seed)
        n_floor = n_ref // 2
        n_rest = n_ref - n_floor
        floor = np.c_[rng.uniform(-40, 40, (n_floor, 2)),
                      rng.normal(0, 0.02, (n_floor, 1))]
        k = 8
        walls = []
        for i in range(k):
            m = n_rest // k
            ang = 2 * np.pi * i / k
            d = rng.uniform(10, 35)
            u = np.array([np.cos(ang), np.sin(ang)])
            t = rng.uniform(-12, 12, (m, 1))
            h = rng.uniform(0, 6, (m, 1))
            base = d * u[None, :] + t * np.array([[-u[1], u[0]]])
            walls.append(np.c_[base, h])
        pts = np.vstack([floor] + walls).astype(np.float32)
        return pts + rng.normal(size=pts.shape).astype(np.float32) * 0.01

    def sample_scan(scene, n, T_inv, seed):
        rng = np.random.default_rng(seed)
        s = np.asarray((4.0, 2.0, 1.5), np.float32)
        rel = scene - s[None, :]
        az = np.degrees(np.arctan2(rel[:, 1], rel[:, 0]))
        r = np.linalg.norm(rel, axis=1)
        visible = (np.abs(az) <= 120.0) & (r <= 45.0)
        idx = np.flatnonzero(visible)
        n_out = int(n * 0.03)
        sel = rng.choice(idx, size=n - n_out, replace=len(idx) < n - n_out)
        pts = scene[sel] + rng.normal(size=(n - n_out, 3)).astype(np.float32) * 0.015
        clutter = np.c_[rng.uniform(-20, 20, (n_out, 2)),
                        rng.uniform(0.2, 3.0, (n_out, 1))].astype(np.float32) \
            + s[None, :] * np.array([1, 1, 0], np.float32)
        pts = np.vstack([pts, clutter]).astype(np.float32)
        R, t = np.asarray(T_inv)[:3, :3], np.asarray(T_inv)[:3, 3]
        return (pts @ R.T + t).astype(np.float32)

    N_READ, MAP_CAP, B = 65536, 131072, 8
    light_cfg = icp_mod.ICPConfig(
        knn=1, max_match_dist=0.5, matcher="grid",
        grid_table_size=1 << 17, grid_bucket_cap=48,
        trimmed_ratio=0.9, minimizer="point_to_plane",
        max_iterations=10, min_diff_rot=1e-3, min_diff_trans=8e-3,
        coarse_iterations=20, coarse_stride=8,
        candidate_refresh_every=10, candidate_slack=0.25,
        fused_kernel=True, fast_trimming=True,
    )
    gicp_cfg = dataclasses.replace(light_cfg, minimizer="gicp", fused_kernel=False)

    scene = synth_scene(400_000)
    submap = pc.from_points(scene, capacity=512 * 1024)
    submap = voxel.voxel_downsample(submap, 0.15, capacity=MAP_CAP)
    ngrid = grid_hash.build_grid(submap.padded_xyz(), submap.mask, 1.0, 1 << 17, 32)
    submap = normals_mod.estimate_normals_grid(
        submap, ngrid, knn=8, max_dist=0.5, orient_towards=(0.0, 0.0, 20.0))
    gicp_ref = icp_mod.build_reference(submap, gicp_cfg)

    T_trues, scans = [], []
    for i in range(B):
        twist = np.array([0.01, -0.008, 0.012, 0.08, -0.05, 0.03], np.float32) * (1 + 0.1 * i)
        T_true = se3.exp_se3(jnp.asarray(twist))
        scans.append(pc.from_points(
            sample_scan(scene, N_READ, se3.transform_inverse(T_true), seed=i),
            capacity=N_READ))
        T_trues.append(np.asarray(T_true))
    gicp_scans = []
    for s in scans:
        gg = grid_hash.build_grid(s.padded_xyz(), s.mask, 0.5, 1 << 16, 32)
        gicp_scans.append(normals_mod.estimate_normals_grid(s, gg, knn=8, max_dist=0.5))
    gicp_reads = pc.stack(gicp_scans)
    perturb = jnp.asarray(se3.exp_se3(
        jnp.asarray([0.012, -0.008, 0.015, 0.06, 0.05, -0.06], jnp.float32)))
    init_Ts = jnp.asarray(np.stack([np.asarray(T) @ np.asarray(perturb) for T in T_trues]))

    @jax.jit
    def gicp_round(reads, reference, Ts):
        res = jax.vmap(lambda r, T: icp_mod.icp_single(r, reference, T, gicp_cfg))(reads, Ts)
        return res.transform @ perturb

    def sync(x):
        return float(jnp.sum(x))

    warm = gicp_round(gicp_reads, gicp_ref, init_Ts)
    sync(warm)
    print(f"[{time.strftime('%H:%M:%S')}] warm; timing", flush=True)
    # relay roundtrip
    f = jax.jit(lambda v: v + 1)
    a = jnp.ones((8,))
    sync(f(a))
    t0 = time.perf_counter()
    for _ in range(10):
        sync(f(a))
    rt = (time.perf_counter() - t0) / 10

    ts = []
    prev = warm
    for _ in range(args.reps):
        t0 = time.perf_counter()
        for _ in range(args.inner):
            prev = gicp_round(gicp_reads, gicp_ref, prev)
        sync(prev)
        ts.append((time.perf_counter() - t0 - rt) / args.inner)
    ts = np.asarray(ts)
    med = float(np.median(ts))
    iqr = float(np.subtract(*np.percentile(ts, [75, 25])))
    print(f"GICP_AB repo={args.repo} regs_per_s={B/med:.2f} "
          f"iqr={B*iqr/(med*med):.2f} rt_ms={rt*1e3:.1f}", flush=True)


if __name__ == "__main__":
    main()
