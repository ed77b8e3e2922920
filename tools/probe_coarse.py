"""Probe: coarse-stage budget on the fused X-ICP production chain.

The refresh-cadence probe showed the per-round gather is already well
pipelined; the next candidate cost centers are the coarse pre-alignment
stage and the fine iteration budget. Variants trade coarse iterations /
stride; accuracy (max_trans_err) guards against cutting too deep.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

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
    MAP_CAP = 131072
    B = 8
    ROUNDS = 4

    base = icp_mod.ICPConfig(
        knn=1, max_match_dist=0.5, matcher="grid", grid_table_size=1 << 17,
        grid_bucket_cap=48, trimmed_ratio=0.9, minimizer="point_to_plane",
        max_iterations=10, min_diff_rot=1e-3, min_diff_trans=8e-3,
        coarse_iterations=20, coarse_stride=8, candidate_refresh_every=10,
        candidate_slack=0.25, fused_kernel=True, fast_trimming=True,
        degeneracy=DegeneracyConfig(method="equality_constraints"),
    )

    scene = synth_scene(400_000)
    submap = pc.from_points(scene, capacity=512 * 1024)
    submap = voxel.voxel_downsample(submap, 0.15, capacity=MAP_CAP)
    ngrid = grid_hash.build_grid(submap.padded_xyz(), submap.mask, 1.0, 1 << 17, 32)
    submap = normals_mod.estimate_normals_grid(
        submap, ngrid, knn=8, max_dist=0.5, orient_towards=(0.0, 0.0, 20.0)
    )
    ref = icp_mod.build_reference(submap, base)

    perturb = jnp.asarray(
        se3.exp_se3(jnp.asarray([0.012, -0.008, 0.015, 0.06, 0.05, -0.06], jnp.float32))
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
    init_Ts = jnp.asarray(np.stack([T @ np.asarray(perturb) for T in T_trues]))

    def sync(x):
        return float(jnp.sum(x))

    rt = relay_roundtrip()

    variants = [
        ("coarse20_s8", dict(coarse_iterations=20, coarse_stride=8)),
        ("coarse10_s8", dict(coarse_iterations=10, coarse_stride=8)),
        ("coarse20_s16", dict(coarse_iterations=20, coarse_stride=16)),
        ("nocoarse", dict(coarse_iterations=0)),
    ]
    if len(sys.argv) > 1:
        variants = [v for v in variants if v[0] in sys.argv[1:]]

    for name, kw in variants:
        cfg = dataclasses.replace(base, **kw)

        @jax.jit
        def chain_round(Ts, cfg=cfg):
            res = jax.vmap(lambda rr, T: icp_mod.icp_single(rr, ref, T, cfg))(readings, Ts)
            return res.transform @ perturb, res.iterations

        t0 = time.perf_counter()
        Ts, iters = chain_round(init_Ts)
        sync(Ts)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(ROUNDS):
            Ts, iters = chain_round(Ts)
        sync(Ts)
        dt = time.perf_counter() - t0 - rt
        out = np.asarray(Ts @ jnp.linalg.inv(perturb))
        errs = [float(np.linalg.norm((np.linalg.inv(out[i]) @ T_trues[i])[:3, 3])) for i in range(B)]
        print(json.dumps({
            "variant": name,
            "regs_per_s": round(ROUNDS * B / dt, 2),
            "mean_iters": round(float(np.mean(np.asarray(iters))), 2),
            "max_trans_err_m": round(max(errs), 6),
            "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
