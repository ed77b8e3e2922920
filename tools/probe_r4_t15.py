"""Round-4 follow-up A/B: can the table-footprint lever (2^17 -> 2^16 gave
+28%) be pushed further? Variants on the bench-exact headline workload:

- table 2^15 / 2^14 at cap 48 (quarter/eighth footprint; watch `dropped`
  + row-saturation for recall loss),
- bucket_cap 32 / 24 at table 2^16 (same cells, shorter rows).

All X-ICP production chain, moments normals (the bench reference path).
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
    return float(jnp.sum(jnp.abs(jnp.asarray(x).astype(jnp.float32))))


def main():
    from bench import synth_scene, sample_scan
    from open3d_slam_private_tpu.geometry import se3
    from open3d_slam_private_tpu.models import icp as icp_mod
    from open3d_slam_private_tpu.models.localizability import DegeneracyConfig
    from open3d_slam_private_tpu.ops import grid_hash, voxel
    from open3d_slam_private_tpu.ops import normals as normals_mod
    from open3d_slam_private_tpu.ops import pointcloud as pc
    from open3d_slam_private_tpu.utils.timing import relay_roundtrip

    rt = relay_roundtrip()
    log(f"relay rt={rt*1e3:.1f} ms")

    N_READ, MAP_CAP, B = 65536, 131072, 8
    scene = synth_scene(400_000)
    submap0 = pc.from_points(scene, capacity=512 * 1024)
    submap0 = voxel.voxel_downsample(submap0, 0.15, capacity=MAP_CAP)
    ngrid = grid_hash.build_grid(submap0.padded_xyz(), submap0.mask, 1.0, 1 << 17, 32)
    sub_mom = normals_mod.estimate_normals_moments(
        submap0, ngrid, max_dist=0.5, orient_towards=(0.0, 0.0, 20.0))

    def cfgt(table, cap):
        return icp_mod.ICPConfig(
            knn=1, max_match_dist=0.5, matcher="grid",
            grid_table_size=table, grid_bucket_cap=cap,
            trimmed_ratio=0.9, minimizer="point_to_plane",
            max_iterations=10, min_diff_rot=1e-3, min_diff_trans=8e-3,
            coarse_iterations=20, coarse_stride=8,
            candidate_refresh_every=10, candidate_slack=0.25,
            fused_kernel=True, fast_trimming=True,
            degeneracy=DegeneracyConfig(
                method="optimized", enough_information_threshold=250.0,
                insufficient_information_threshold=180.0),
        )

    T_trues, scans = [], []
    for i in range(B):
        twist = np.array([0.01, -0.008, 0.012, 0.08, -0.05, 0.03], np.float32) * (1 + 0.1 * i)
        T_true = se3.exp_se3(jnp.asarray(twist))
        scans.append(pc.from_points(
            sample_scan(scene, N_READ, se3.transform_inverse(T_true), seed=i),
            capacity=N_READ))
        T_trues.append(np.asarray(T_true))
    readings = pc.stack(scans)
    perturb = jnp.asarray(se3.exp_se3(
        jnp.asarray([0.012, -0.008, 0.015, 0.06, 0.05, -0.06], jnp.float32)))
    init_Ts = jnp.asarray(np.stack([T @ np.asarray(perturb) for T in T_trues]))

    def run_variant(name, cfg):
        ref = icp_mod.build_reference(sub_mom, cfg)
        log(f"{name}: cell-list dropped={int(ref.grid.dropped)}")

        @jax.jit
        def f(reads, reference, Ts):
            res = jax.vmap(lambda r, T: icp_mod.icp_single(r, reference, T, cfg))(reads, Ts)
            return res.transform @ perturb, res.iterations, res.match_row_saturation

        warm, _, _ = f(readings, ref, init_Ts)
        sync(warm)
        prev = warm
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(3):
                prev, iters, sat = f(readings, ref, prev)
            sync(prev)
            ts.append((time.perf_counter() - t0 - rt) / 3)
        med = float(np.median(ts))
        out_T = np.asarray(prev @ jnp.linalg.inv(perturb))
        errs = [float(np.linalg.norm(np.linalg.inv(out_T[i]) @ T_trues[i] - np.eye(4)))
                for i in range(B)]
        log(f"{name}: {B/med:.1f} reg/s iters={float(np.mean(np.asarray(iters))):.1f} "
            f"maxTerr={max(errs):.4f} rowsat={float(np.max(np.asarray(sat))):.4f}")

    run_variant("t16 cap48 (bench r4)", cfgt(1 << 16, 48))
    run_variant("t15 cap48", cfgt(1 << 15, 48))
    run_variant("t14 cap48", cfgt(1 << 14, 48))
    run_variant("t16 cap32", cfgt(1 << 16, 32))
    run_variant("t16 cap24", cfgt(1 << 16, 24))
    run_variant("t15 cap64", cfgt(1 << 15, 64))
    log("done")


if __name__ == "__main__":
    main()
