"""gather_kernel failure bisect #3: which production-config feature breaks
the vmapped big-shape compile (ref always passed as jit ARG)."""

import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    from open3d_slam_private_tpu.models import icp as icp_mod
    from open3d_slam_private_tpu.models.localizability import DegeneracyConfig
    from open3d_slam_private_tpu.ops import grid_hash
    from open3d_slam_private_tpu.ops import normals as normals_mod
    from open3d_slam_private_tpu.ops import pointcloud as pc

    rng = np.random.default_rng(0)
    pts = (rng.uniform(-20, 20, size=(120000, 3)) * np.array([1, 1, 0.1])).astype(np.float32)
    ref_b = pc.from_points(pts, capacity=131072)
    g = grid_hash.build_grid(ref_b.padded_xyz(), ref_b.mask, 1.0, 1 << 12, 32)
    ref_b = normals_mod.estimate_normals_moments(ref_b, g, max_dist=1.0)

    base = icp_mod.ICPConfig(
        knn=1, max_match_dist=0.5, matcher="grid", grid_table_size=1 << 16,
        grid_bucket_cap=48, trimmed_ratio=0.9, fast_trimming=True,
        minimizer="point_to_plane", max_iterations=8,
        candidate_refresh_every=5, candidate_slack=0.25,
        gather_kernel=True,
    )
    variants = [
        ("C1 base", base),
        ("C2 +coarse", dataclasses.replace(base, coarse_iterations=20, coarse_stride=8)),
        ("C3 +fused+degeneracy", dataclasses.replace(
            base, coarse_iterations=20, coarse_stride=8, fused_kernel=True,
            degeneracy=DegeneracyConfig(
                method="optimized", enough_information_threshold=250.0,
                insufficient_information_threshold=180.0))),
    ]
    reading = pc.from_points(pts[:65536], capacity=65536)
    reads = pc.stack([reading] * 8)
    Ts = jnp.tile(jnp.eye(4), (8, 1, 1))

    for name, cfg in variants:
        try:
            ref = icp_mod.build_reference(ref_b, cfg)

            @jax.jit
            def f(r, reference, T, cfg=cfg):
                return jax.vmap(
                    lambda rr, TT: icp_mod.icp_single(rr, reference, TT, cfg).transform
                )(r, T)

            out = f(reads, ref, Ts)
            jax.block_until_ready(out)
            log(f"{name}: OK")
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}")
    log("done")


if __name__ == "__main__":
    main()
