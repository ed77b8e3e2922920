"""Chunked gather+rank: find the best chunk size for the 64k-query select.

Follow-up to probe_gather.py: 32k queries rank 3.9x faster than 64k (VMEM
fusion cliff). Test chunked full-production round_select (gather + match +
trim) at several chunk sizes vs the current monolithic one.
"""
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

    def make_select(chunk):
        @jax.jit
        def select(reads, reference, Ts):
            def one(reading, T):
                src0 = se3.apply_transform(T, reading.xyz)
                if chunk is None:
                    rows, valid = cell_mod.gather_cell_candidates(
                        reference.grid, src0, reading.mask)
                    res0 = grid_mod.match_from_candidates(
                        rows, valid, src0, reading.mask, cfg.max_match_dist, cfg.knn)
                else:
                    n = src0.shape[0]
                    def piece(c):
                        s, m = c
                        rows, valid = cell_mod.gather_cell_candidates(
                            reference.grid, s, m)
                        r = grid_mod.match_from_candidates(
                            rows, valid, s, m, cfg.max_match_dist, cfg.knn)
                        return r.dists, r.ids, r.xyz, r.normals
                    d, i, x, nr = jax.lax.map(
                        piece,
                        (src0.reshape(n // chunk, chunk, 3),
                         reading.mask.reshape(n // chunk, chunk)),
                    )
                    res0 = grid_mod.MatchResult(
                        dists=d.reshape(n, -1), ids=i.reshape(n, -1),
                        xyz=x.reshape(n, -1, 3), normals=nr.reshape(n, -1, 3))
                tl = outliers.trimmed_dist_limit(
                    res0.dists, res0.valid(), cfg.trimmed_ratio, cfg.max_match_dist**2)
                return res0.xyz, res0.normals, res0.ids, res0.dists, tl
            q, n, ids, d, tl = jax.vmap(one)(reads, Ts)
            return ids, jnp.sum(q[..., 0]) * 1e-9 + jnp.sum(tl)
        return select

    cases = [("mono", make_select(None))] + [
        (f"chunk{c//1024}k", make_select(c)) for c in (8192, 16384, 32768)
    ]
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=4) as ex:
        futs = [(nm, ex.submit(lambda f=fn: sync(f(readings, ref, Ts)[1]))) for nm, fn in cases]
        for nm, f in futs:
            f.result()
            print(f"warm {nm}: {time.perf_counter()-t0:.0f}s", flush=True)

    ids_ref = None
    for nm, fn in cases:
        ids, _ = fn(readings, ref, Ts)
        if ids_ref is None:
            ids_ref = np.asarray(ids)
        else:
            same = np.mean(np.asarray(ids) == ids_ref)
            assert same == 1.0, (nm, same)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(3):
                out = fn(readings, ref, Ts)[1]
            sync(out)
            ts.append((time.perf_counter() - t0 - rt) / 3)
        print(f"select {nm}: {float(np.median(ts))*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
