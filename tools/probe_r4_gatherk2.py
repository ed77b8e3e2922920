"""Minimal in-chain gather-kernel repro with FULL error output."""

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
    from open3d_slam_private_tpu.kernels import gather_select_pallas as gsk
    from open3d_slam_private_tpu.kernels import select_pallas as selk
    from open3d_slam_private_tpu.ops import cell_list as cell_mod

    rng = np.random.default_rng(0)
    pts = (rng.uniform(-20, 20, size=(20000, 3)) * np.array([1, 1, 0.1])).astype(np.float32)
    ref_b = pc.from_points(pts, capacity=32768)
    g = grid_hash.build_grid(ref_b.padded_xyz(), ref_b.mask, 1.0, 1 << 12, 32)
    ref_b = normals_mod.estimate_normals_moments(ref_b, g, max_dist=1.0)

    cl = cell_mod.build_cell_list(
        ref_b.padded_xyz(), ref_b.mask, 0.75, table_size=1 << 12, list_cap=48,
        normals=ref_b.normals)

    q = jnp.asarray(pts[:4096] + 0.02 * rng.normal(size=(4096, 3)).astype(np.float32))
    mask = jnp.ones((4096,), bool)

    # Step 1: bare kernel on a REAL cell-list table (not random data).
    try:
        tiled = gsk.tile_table(cl.table)
        cellq = jnp.floor(q / cl.cell_size).astype(jnp.int32)
        h = grid_hash._cell_hash(cellq, cl.table_size)
        sel = gsk.gather_select(tiled, h, q, mask)
        got = selk.match_result_from_selected(sel, mask, 0.75**2)
        nvalid = int(jnp.sum(got.ids >= 0))
        log(f"step1 bare kernel on real table: OK, {nvalid}/4096 matched")
    except Exception as e:
        log(f"step1 FAILED: {type(e).__name__}")
        print(str(e), flush=True)
        return

    # Step 2: inside jit.
    try:
        @jax.jit
        def f(tab, h, q, m):
            return gsk.gather_select(tab, h, q, m)
        out = f(tiled, h, q, mask)
        log(f"step2 jitted: OK sum={float(jnp.sum(jnp.abs(out))):.3e}")
    except Exception as e:
        log(f"step2 FAILED: {type(e).__name__}")
        print(str(e), flush=True)
        return

    # Step 3: full register_pair with gather_kernel.
    cfg = icp_mod.ICPConfig(
        knn=1, max_match_dist=0.5, matcher="grid", grid_table_size=1 << 12,
        grid_bucket_cap=48, trimmed_ratio=0.9, fast_trimming=True,
        minimizer="point_to_plane", max_iterations=8,
        candidate_refresh_every=5, candidate_slack=0.25,
        gather_kernel=True,
    )
    reading = pc.from_points(pts[:8192], capacity=8192)
    try:
        res = icp_mod.register_pair(reading, ref_b, jnp.eye(4), cfg)
        log(f"step3 register_pair: OK conv={bool(res.converged)}")
    except Exception as e:
        log(f"step3 FAILED: {type(e).__name__}")
        print(str(e), flush=True)
        return
    log("done")


if __name__ == "__main__":
    main()
