"""A/B the round-3 kernels on the production X-ICP chain (TPU).

Variants: r2 fused (padded pair kernel forced via knn... n/a — folded is
automatic), so: (a) folded fused kernel, XLA select; (b) + Pallas select
kernel. Reports reg/s (median of 5), accuracy, iterations.
"""
import dataclasses
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import synth_scene, sample_scan


def main():
    from open3d_slam_private_tpu.geometry import se3
    from open3d_slam_private_tpu.models import icp as icp_mod
    from open3d_slam_private_tpu.models.localizability import DegeneracyConfig
    from open3d_slam_private_tpu.ops import grid_hash
    from open3d_slam_private_tpu.ops import normals as normals_mod
    from open3d_slam_private_tpu.ops import pointcloud as pc
    from open3d_slam_private_tpu.ops import voxel
    from open3d_slam_private_tpu.utils.timing import relay_roundtrip

    N_READ = 65536
    B = 8
    base = icp_mod.ICPConfig(
        knn=1, max_match_dist=0.5, matcher="grid", grid_table_size=1 << 17,
        grid_bucket_cap=48, trimmed_ratio=0.9, minimizer="point_to_plane",
        max_iterations=10, min_diff_rot=1e-3, min_diff_trans=8e-3,
        coarse_iterations=20, coarse_stride=8, candidate_refresh_every=10,
        candidate_slack=0.25, fused_kernel=True, fast_trimming=True,
        degeneracy=DegeneracyConfig(
            method="optimized",
            enough_information_threshold=250.0,
            insufficient_information_threshold=180.0,
        ),
    )
    variants = [
        ("cap48 ", base),
        ("cap32 ", dataclasses.replace(base, grid_bucket_cap=32)),
        ("cap24 ", dataclasses.replace(base, grid_bucket_cap=24)),
    ]

    scene = synth_scene(400_000)
    submap = pc.from_points(scene, capacity=512 * 1024)
    submap = voxel.voxel_downsample(submap, 0.15, capacity=131072)
    ngrid = grid_hash.build_grid(submap.padded_xyz(), submap.mask, 1.0, 1 << 17, 32)
    submap = normals_mod.estimate_normals_grid(
        submap, ngrid, knn=8, max_dist=0.5, orient_towards=(0.0, 0.0, 20.0))
    refs = {48: icp_mod.build_reference(submap, base),
            32: icp_mod.build_reference(submap, dataclasses.replace(base, grid_bucket_cap=32)),
            24: icp_mod.build_reference(submap, dataclasses.replace(base, grid_bucket_cap=24))}

    T_trues, scans = [], []
    for i in range(B):
        tw = np.array([0.01, -0.008, 0.012, 0.08, -0.05, 0.03], np.float32) * (1 + 0.1 * i)
        T = se3.exp_se3(jnp.asarray(tw))
        scans.append(pc.from_points(
            sample_scan(scene, N_READ, se3.transform_inverse(T), seed=i),
            capacity=N_READ))
        T_trues.append(np.asarray(T))
    readings = pc.stack(scans)
    perturb = jnp.asarray(se3.exp_se3(jnp.asarray(
        [0.012, -0.008, 0.015, 0.06, 0.05, -0.06], jnp.float32)))
    init_Ts = jnp.asarray(np.stack([T @ np.asarray(perturb) for T in T_trues]))

    rt = relay_roundtrip()
    print(f"relay rt {rt*1e3:.1f} ms", flush=True)

    def sync(x):
        return float(jnp.sum(x))

    progs = []
    for name, cfg in variants:
        @jax.jit
        def chain(reads, reference, Ts, cfg=cfg):
            res = jax.vmap(lambda r, T: icp_mod.icp_single(r, reference, T, cfg))(reads, Ts)
            return res.transform @ perturb, res.iterations, res.match_row_saturation
        progs.append((name, chain, refs[cfg.grid_bucket_cap]))

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=3) as ex:
        futs = [(nm, ex.submit(lambda f=fn, r=rr: sync(f(readings, r, init_Ts)[0])))
                for nm, fn, rr in progs]
        for nm, f in futs:
            f.result()
            print(f"warm {nm}: {time.perf_counter()-t0:.0f}s", flush=True)

    for nm, fn, ref in progs:
        Ts, iters, sat = fn(readings, ref, init_Ts)
        sync(Ts)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(3):
                Ts, iters, sat = fn(readings, ref, Ts)
            sync(Ts)
            ts.append((time.perf_counter() - t0 - rt) / 3)
        med = float(np.median(ts))
        iqr = float(np.subtract(*np.percentile(ts, [75, 25])))
        out = np.asarray(Ts @ jnp.linalg.inv(perturb))
        errs = [float(np.linalg.norm((np.linalg.inv(out[i]) @ T_trues[i])[:3, 3]))
                for i in range(B)]
        print(f"{nm}: {B/med:7.1f} reg/s ({med*1e3:.2f} ms/call, iqr {iqr*1e3:.2f}) "
              f"max_err {max(errs)*1e3:.2f} mm  mean_it {float(np.mean(np.asarray(iters))):.1f} "
              f"sat {float(np.mean(np.asarray(sat))):.3f}", flush=True)


if __name__ == "__main__":
    main()
