"""A/B: XLA match_from_candidates vs Pallas rank_select kernel (knn=1)."""
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
    from open3d_slam_private_tpu.kernels import select_pallas as sel_mod
    from open3d_slam_private_tpu.ops import cell_list as cell_mod
    from open3d_slam_private_tpu.ops import grid_hash as grid_mod
    from open3d_slam_private_tpu.ops import normals as normals_mod
    from open3d_slam_private_tpu.ops import outliers
    from open3d_slam_private_tpu.ops import pointcloud as pc
    from open3d_slam_private_tpu.ops import voxel
    from open3d_slam_private_tpu.utils.timing import relay_roundtrip

    N_READ = 65536
    B = 8
    cfg = icp_mod.ICPConfig(
        knn=1, max_match_dist=0.5, matcher="grid", grid_table_size=1 << 17,
        grid_bucket_cap=48, trimmed_ratio=0.9, minimizer="point_to_plane",
        fast_trimming=True, candidate_refresh_every=10, candidate_slack=0.25,
    )
    scene = synth_scene(400_000)
    submap = pc.from_points(scene, capacity=512 * 1024)
    submap = voxel.voxel_downsample(submap, 0.15, capacity=131072)
    ngrid = grid_mod.build_grid(submap.padded_xyz(), submap.mask, 1.0, 1 << 17, 32)
    submap = normals_mod.estimate_normals_grid(
        submap, ngrid, knn=8, max_dist=0.5, orient_towards=(0.0, 0.0, 20.0))
    ref = icp_mod.build_reference(submap, cfg)

    scans = []
    for i in range(B):
        tw = np.array([0.01, -0.008, 0.012, 0.08, -0.05, 0.03], np.float32) * (1 + 0.1 * i)
        T = se3.exp_se3(jnp.asarray(tw))
        scans.append(pc.from_points(
            sample_scan(scene, N_READ, se3.transform_inverse(T), seed=i),
            capacity=N_READ))
    readings = pc.stack(scans)
    Ts = jnp.tile(jnp.eye(4), (B, 1, 1))
    rt = relay_roundtrip()
    print(f"relay rt {rt*1e3:.1f} ms", flush=True)

    def sync(x):
        return float(jnp.sum(x))

    max_d2 = cfg.max_match_dist ** 2

    @jax.jit
    def select_mono(reads, reference, Ts):
        def one(reading, T):
            src0 = se3.apply_transform(T, reading.xyz)
            rows, valid = cell_mod.gather_cell_candidates(reference.grid, src0, reading.mask)
            r = grid_mod.match_from_candidates(
                rows, valid, src0, reading.mask, cfg.max_match_dist, cfg.knn)
            tl = outliers.trimmed_dist_limit(r.dists, r.valid(), cfg.trimmed_ratio, max_d2)
            return r.ids, r.dists, jnp.sum(r.xyz) * 1e-9 + tl
        ids, d, s = jax.vmap(one)(reads, Ts)
        return ids, d, jnp.sum(s)

    @jax.jit
    def select_kernel(reads, reference, Ts):
        table_size = reference.grid.table_size
        flat = reference.grid.table.reshape(table_size, -1)

        def one(reading, T):
            src0 = se3.apply_transform(T, reading.xyz)
            cellq = jnp.floor(src0 / reference.grid.cell_size).astype(jnp.int32)
            h = grid_mod._cell_hash(cellq, table_size)
            rowsf = flat[h]
            sel = sel_mod.rank_select_rows(rowsf, src0, reading.mask)
            r = sel_mod.match_result_from_selected(sel, reading.mask, max_d2)
            tl = outliers.trimmed_dist_limit(r.dists, r.valid(), cfg.trimmed_ratio, max_d2)
            return r.ids, r.dists, jnp.sum(r.xyz) * 1e-9 + tl
        ids, d, s = jax.vmap(one)(reads, Ts)
        return ids, d, jnp.sum(s)

    cases = [("mono", select_mono), ("kernel", select_kernel)]
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=2) as ex:
        futs = [(nm, ex.submit(lambda f=fn: sync(f(readings, ref, Ts)[2]))) for nm, fn in cases]
        for nm, f in futs:
            f.result()
            print(f"warm {nm}: {time.perf_counter()-t0:.0f}s", flush=True)

    i0, d0, _ = select_mono(readings, ref, Ts)
    i1, d1, _ = select_kernel(readings, ref, Ts)
    i0, i1 = np.asarray(i0), np.asarray(i1)
    agree = float(np.mean(i0 == i1))
    dd = np.abs(np.asarray(d0) - np.asarray(d1))
    dd = dd[np.isfinite(dd)]
    print(f"id agreement: {agree:.6f}  max|d2 diff| {dd.max():.3e}", flush=True)

    for nm, fn in cases:
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(3):
                out = fn(readings, ref, Ts)[2]
            sync(out)
            ts.append((time.perf_counter() - t0 - rt) / 3)
        print(f"select {nm}: {float(np.median(ts))*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
