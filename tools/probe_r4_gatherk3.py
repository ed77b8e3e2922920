"""gather_kernel failure bisect #2: vmap vs problem size."""

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
    from open3d_slam_private_tpu.geometry import se3
    from open3d_slam_private_tpu.models import icp as icp_mod
    from open3d_slam_private_tpu.ops import grid_hash
    from open3d_slam_private_tpu.ops import normals as normals_mod
    from open3d_slam_private_tpu.ops import pointcloud as pc

    rng = np.random.default_rng(0)

    def setup(n_ref, cap_ref, table, n_read):
        pts = (rng.uniform(-20, 20, size=(n_ref, 3)) * np.array([1, 1, 0.1])).astype(np.float32)
        ref_b = pc.from_points(pts, capacity=cap_ref)
        g = grid_hash.build_grid(ref_b.padded_xyz(), ref_b.mask, 1.0, 1 << 12, 32)
        ref_b = normals_mod.estimate_normals_moments(ref_b, g, max_dist=1.0)
        cfg = icp_mod.ICPConfig(
            knn=1, max_match_dist=0.5, matcher="grid", grid_table_size=table,
            grid_bucket_cap=48, trimmed_ratio=0.9, fast_trimming=True,
            minimizer="point_to_plane", max_iterations=8,
            candidate_refresh_every=5, candidate_slack=0.25,
            gather_kernel=True,
        )
        ref = icp_mod.build_reference(ref_b, cfg)
        reading = pc.from_points(pts[:n_read], capacity=n_read)
        return ref, reading, cfg

    # A: vmap, small everything.
    try:
        ref, reading, cfg = setup(20000, 32768, 1 << 12, 4096)
        reads = pc.stack([reading, reading])
        Ts = jnp.stack([jnp.eye(4), jnp.eye(4)])
        out = jax.jit(lambda r, T: jax.vmap(
            lambda rr, TT: icp_mod.icp_single(rr, ref, TT, cfg).transform)(r, T))(reads, Ts)
        log(f"A vmap-small: OK {np.asarray(out).shape}")
    except Exception as e:
        log(f"A vmap-small FAILED: {type(e).__name__}")
        print(str(e)[:2000], flush=True)

    # B: no vmap, big reference table (2^16) + 64k reading.
    try:
        ref, reading, cfg = setup(120000, 131072, 1 << 16, 65536)
        res = icp_mod.icp_single(reading, ref, jnp.eye(4), cfg)
        jax.block_until_ready(res.transform)
        log("B single-big: OK")
    except Exception as e:
        log(f"B single-big FAILED: {type(e).__name__}")
        print(str(e)[:2000], flush=True)

    # C: vmap B=8 on the big problem.
    try:
        reads = pc.stack([reading] * 8)
        Ts = jnp.tile(jnp.eye(4), (8, 1, 1))
        out = jax.jit(lambda r, T: jax.vmap(
            lambda rr, TT: icp_mod.icp_single(rr, ref, TT, cfg).transform)(r, T))(reads, Ts)
        jax.block_until_ready(out)
        log("C vmap-big: OK")
    except Exception as e:
        log(f"C vmap-big FAILED: {type(e).__name__}")
        print(str(e)[:2000], flush=True)
    log("done")


if __name__ == "__main__":
    main()
