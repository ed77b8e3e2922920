"""MXU-rank candidate selection vs the current per-candidate-layout select.

match_from_candidates works on [N, 48, 8] arrays (minor dim 8 = 8/128 VPU
lanes). This probe ranks on the FLAT [N, 384] gathered layout instead:
d2 per candidate via a [384, 48] segment-sum matmul, winner-row extraction
via a repeated pick mask + [384, 8] channel matmul. Checks exact id parity
with the current path.
"""
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import synth_scene, sample_scan

CAP = 48
CH = 8


def main():
    from open3d_slam_private_tpu.geometry import se3
    from open3d_slam_private_tpu.models import icp as icp_mod
    from open3d_slam_private_tpu.ops import cell_list as cell_mod
    from open3d_slam_private_tpu.ops import grid_hash as grid_mod
    from open3d_slam_private_tpu.ops import normals as normals_mod
    from open3d_slam_private_tpu.ops import outliers
    from open3d_slam_private_tpu.ops import pointcloud as pc
    from open3d_slam_private_tpu.ops import voxel
    from open3d_slam_private_tpu.ops.knn import INVALID_ID, INF
    from open3d_slam_private_tpu.utils.timing import relay_roundtrip

    N_READ = 65536
    B = 8
    cfg = icp_mod.ICPConfig(
        knn=1, max_match_dist=0.5, matcher="grid", grid_table_size=1 << 17,
        grid_bucket_cap=CAP, trimmed_ratio=0.9, minimizer="point_to_plane",
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
            return r.ids, r.xyz, r.normals, r.dists, tl
        ids, x, nr, d, tl = jax.vmap(one)(reads, Ts)
        return ids, jnp.sum(x) * 1e-9 + jnp.sum(tl)

    # Static lane helpers.
    lane = np.arange(CAP * CH)
    G = jnp.asarray(((lane[:, None] // CH == np.arange(CAP)[None, :]) &
                     (lane[:, None] % CH < 3)).astype(np.float32))  # [384, 48]
    H = jnp.asarray((lane[:, None] % CH == np.arange(CH)[None, :]).astype(np.float32) *
                    (lane[:, None] // CH >= 0))  # [384, 8] (sums groups)
    chm = jnp.asarray((lane % CH < 3).astype(np.float32))  # [384]

    @jax.jit
    def select_mxu(reads, reference, Ts):
        table_size = reference.grid.table_size
        flat = reference.grid.table.reshape(table_size, CAP * CH)

        def one(reading, T):
            src0 = se3.apply_transform(T, reading.xyz)
            cellq = jnp.floor(src0 / reference.grid.cell_size).astype(jnp.int32)
            h = grid_mod._cell_hash(cellq, table_size)
            rowsf = flat[h]  # [N, 384]
            # Broadcast query xyz into the ch<3 lanes of every candidate.
            q8 = jnp.pad(src0, ((0, 0), (0, CH - 3)))  # [N, 8]
            brq = jnp.tile(q8, (1, CAP))  # [N, 384]
            diff = (rowsf - brq) * chm
            d2 = diff @ G  # [N, 48] MXU segment sum
            d2 = jnp.where(reading.mask[:, None], d2, INF)
            best_d = jnp.min(d2, axis=-1, keepdims=True)
            is_min = d2 <= best_d
            first = jnp.cumsum(is_min.astype(jnp.int32), axis=-1) == 1
            pick = (is_min & first).astype(jnp.float32)  # [N, 48]
            pickexp = jnp.repeat(pick, CH, axis=-1)  # [N, 384]
            sel = (rowsf * pickexp) @ H  # [N, 8]
            best_i = jax.lax.bitcast_convert_type(sel[:, 3], jnp.int32)
            bd = best_d[:, 0]
            bad = (bd > max_d2) | ~jnp.isfinite(bd) | ~reading.mask
            ids = jnp.where(bad, INVALID_ID, best_i)[:, None]
            x = jnp.where(bad[:, None], 0.0, sel[:, :3])[:, None, :]
            nr = jnp.where(bad[:, None], 0.0, sel[:, 4:7])[:, None, :]
            d = jnp.where(bad, INF, bd)[:, None]
            tl = outliers.trimmed_dist_limit(d, ids >= 0, cfg.trimmed_ratio, max_d2)
            return ids, x, nr, d, tl
        ids, x, nr, d, tl = jax.vmap(one)(reads, Ts)
        return ids, jnp.sum(x) * 1e-9 + jnp.sum(tl)

    cases = [("mono", select_mono), ("mxu", select_mxu)]
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=4) as ex:
        futs = [(nm, ex.submit(lambda f=fn: sync(f(readings, ref, Ts)[1]))) for nm, fn in cases]
        for nm, f in futs:
            f.result()
            print(f"warm {nm}: {time.perf_counter()-t0:.0f}s", flush=True)

    ids_mono = np.asarray(select_mono(readings, ref, Ts)[0])
    ids_mxu = np.asarray(select_mxu(readings, ref, Ts)[0])
    agree = float(np.mean(ids_mono == ids_mxu))
    print(f"id agreement: {agree:.6f}", flush=True)

    for nm, fn in cases:
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
