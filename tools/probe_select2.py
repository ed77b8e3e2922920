"""Unrolled-chunk variants of the production round select (knn=1).

lax.map chunking showed no win (loop machinery serializes + copies);
unrolled python-loop chunks let XLA schedule the pieces as independent
fusions. Also an MXU-rank variant (flat [n,384] layout, integer-safe id
extraction).
"""
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import synth_scene, sample_scan

CAP, CH = 48, 8


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

    def finish(r, reading):
        tl = outliers.trimmed_dist_limit(r.dists, r.valid(), cfg.trimmed_ratio, max_d2)
        return r.ids, r.dists, jnp.sum(r.xyz) * 1e-9 + tl

    def make_classic(chunks, barrier=False):
        @jax.jit
        def select(reads, reference, Ts):
            def one(reading, T):
                src0 = se3.apply_transform(T, reading.xyz)
                n = src0.shape[0]
                c = n // chunks
                outs = []
                for j in range(chunks):
                    s = src0[j * c:(j + 1) * c]
                    m = reading.mask[j * c:(j + 1) * c]
                    rows, valid = cell_mod.gather_cell_candidates(reference.grid, s, m)
                    if barrier:
                        rows, valid = jax.lax.optimization_barrier((rows, valid))
                    outs.append(grid_mod.match_from_candidates(
                        rows, valid, s, m, cfg.max_match_dist, cfg.knn))
                r = grid_mod.MatchResult(
                    dists=jnp.concatenate([o.dists for o in outs]),
                    ids=jnp.concatenate([o.ids for o in outs]),
                    xyz=jnp.concatenate([o.xyz for o in outs]),
                    normals=jnp.concatenate([o.normals for o in outs]),
                )
                return finish(r, reading)
            ids, d, s = jax.vmap(one)(reads, Ts)
            return ids, d, jnp.sum(s)
        return select

    lane = np.arange(CAP * CH)
    G = jnp.asarray(((lane[:, None] // CH == np.arange(CAP)[None, :]) &
                     (lane[:, None] % CH < 3)).astype(np.float32))
    H = jnp.asarray(((lane[:, None] % CH == np.arange(CH)[None, :]) &
                     (lane[:, None] % CH != 3)).astype(np.float32))
    chm = jnp.asarray((lane % CH < 3).astype(np.float32))
    is_idl = jnp.asarray(lane % CH == 3)

    def make_mxu(chunks, barrier=False):
        @jax.jit
        def select(reads, reference, Ts):
            table_size = reference.grid.table_size
            flat = reference.grid.table.reshape(table_size, CAP * CH)

            def piece(src, msk):
                cellq = jnp.floor(src / ref.grid.cell_size).astype(jnp.int32)
                h = grid_mod._cell_hash(cellq, table_size)
                rowsf = flat[h]
                if barrier:
                    rowsf = jax.lax.optimization_barrier(rowsf)
                q8 = jnp.pad(src, ((0, 0), (0, CH - 3)))
                brq = jnp.tile(q8, (1, CAP))
                diff = (rowsf - brq) * chm
                d2 = diff @ G
                d2 = jnp.where(msk[:, None], d2, INF)
                bd = jnp.min(d2, axis=-1, keepdims=True)
                ci = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
                win = jnp.min(jnp.where(d2 <= bd, ci, CAP), axis=-1, keepdims=True)
                pick = (ci == win).astype(jnp.float32)
                pickexp = jnp.repeat(pick, CH, axis=-1)
                sel = (rowsf * pickexp) @ H
                ids_i = jax.lax.bitcast_convert_type(rowsf, jnp.int32)
                sel_id = jnp.sum(jnp.where((pickexp > 0.5) & is_idl[None, :], ids_i, 0), axis=-1)
                bdv = bd[:, 0]
                bad = (bdv > max_d2) | ~jnp.isfinite(bdv) | ~msk
                return (
                    jnp.where(bad, INF, bdv)[:, None],
                    jnp.where(bad, INVALID_ID, sel_id)[:, None],
                    jnp.where(bad[:, None], 0.0, sel[:, :3])[:, None, :],
                    jnp.where(bad[:, None], 0.0, sel[:, 4:7])[:, None, :],
                )

            def one(reading, T):
                src0 = se3.apply_transform(T, reading.xyz)
                n = src0.shape[0]
                c = n // chunks
                outs = [piece(src0[j * c:(j + 1) * c], reading.mask[j * c:(j + 1) * c])
                        for j in range(chunks)]
                r = grid_mod.MatchResult(
                    dists=jnp.concatenate([o[0] for o in outs]),
                    ids=jnp.concatenate([o[1] for o in outs]),
                    xyz=jnp.concatenate([o[2] for o in outs]),
                    normals=jnp.concatenate([o[3] for o in outs]),
                )
                return finish(r, reading)
            ids, d, s = jax.vmap(one)(reads, Ts)
            return ids, d, jnp.sum(s)
        return select

    cases = [
        ("classic x1 ", make_classic(1)),
        ("classic x1b", make_classic(1, barrier=True)),
        ("classic x2b", make_classic(2, barrier=True)),
        ("mxu     x1b", make_mxu(1, barrier=True)),
    ]
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=4) as ex:
        futs = [(nm, ex.submit(lambda f=fn: sync(f(readings, ref, Ts)[2]))) for nm, fn in cases]
        for nm, f in futs:
            f.result()
            print(f"warm {nm}: {time.perf_counter()-t0:.0f}s", flush=True)

    ids_ref = np.asarray(cases[0][1](readings, ref, Ts)[0])
    for nm, fn in cases[1:]:
        agree = float(np.mean(np.asarray(fn(readings, ref, Ts)[0]) == ids_ref))
        print(f"{nm} id agreement {agree:.6f}", flush=True)

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


def extra_barrier():
    """Barrier variants: materialize the gather once, then consume."""
    main.__wrapped__ if hasattr(main, "__wrapped__") else None
