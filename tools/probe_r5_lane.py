"""Round-5 probe: lane-major candidate re-rank (the untried angle from the
round-4 verdict).

The per-round selection consumes gathered candidate rows [N, 48, 8]; on
TPU the minor axis maps to lanes, so every elementwise pass runs at 8/128
(payload) or 48/128 (distance) lane utilization. Variant B transposes the
gathered rows to [8, 48, N] once and runs the whole rank at full 128-lane
width over N. Measured standalone AND with the d2+min consumer fused after
the gather, bench-identical shapes (64k queries, cap-48 cell list).
"""
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


INF = jnp.inf


def main():
    from bench import synth_scene, sample_scan
    from open3d_slam_private_tpu.ops import cell_list as cell_mod
    from open3d_slam_private_tpu.ops import grid_hash as grid_mod
    from open3d_slam_private_tpu.ops import normals as normals_mod
    from open3d_slam_private_tpu.ops import pointcloud as pc
    from open3d_slam_private_tpu.ops import voxel
    from open3d_slam_private_tpu.utils.timing import relay_roundtrip

    rt = relay_roundtrip()
    log(f"relay rt={rt*1e3:.1f} ms")

    N, MAP_CAP = 65536, 131072
    scene = synth_scene(400_000)
    submap = pc.from_points(scene, capacity=512 * 1024)
    submap = voxel.voxel_downsample(submap, 0.15, capacity=MAP_CAP)
    g0 = grid_mod.build_grid(submap.padded_xyz(), submap.mask, 1.0, 1 << 17, 32)
    submap = normals_mod.estimate_normals_grid(
        submap, g0, knn=8, max_dist=0.5, orient_towards=(0.0, 0.0, 20.0))
    cl = cell_mod.build_cell_list(
        submap.padded_xyz(), submap.mask, 0.5, 1 << 16, 48,
        normals=submap.normals)
    scan = pc.from_points(sample_scan(scene, N, np.eye(4), seed=0), capacity=N)
    q = scan.padded_xyz()
    qm = scan.mask
    radius = 0.5

    _IDX_CH = grid_mod._IDX_CH
    _NRM = grid_mod._NRM

    @jax.jit
    def variant_a(cl, q, qm, dq):
        """Current path: gather + match_from_candidates (k=1)."""
        qq = q + dq
        rows, valid = cell_mod.gather_cell_candidates(cl, qq, qm)
        res = grid_mod.match_from_candidates(rows, valid, qq, qm, radius, k=1)
        return res.dists, res.ids, res.xyz, res.normals

    @jax.jit
    def variant_b(cl, q, qm, dq):
        """Lane-major: gather, transpose once, full-width rank over N."""
        qq = q + dq
        rows, valid = cell_mod.gather_cell_candidates(cl, qq, qm)
        rT = rows.transpose(2, 1, 0)  # [8, 48, N]
        vT = valid.T  # [48, N]
        diff = rT[:3] - qq.T[:, None, :]  # [3, 48, N]
        d2 = jnp.sum(diff * diff, axis=0)  # [48, N]
        d2 = jnp.where(vT, d2, INF)
        best_d = jnp.min(d2, axis=0)  # [N]
        is_min = d2 <= best_d[None, :]
        first = jnp.cumsum(is_min.astype(jnp.int32), axis=0) == 1
        pick = (is_min & first).astype(rows.dtype)  # [48, N]
        selT = jnp.sum(rT * pick[None, :, :], axis=1)  # [8, N]
        ids = jax.lax.bitcast_convert_type(rT[_IDX_CH], jnp.int32)  # [48,N]
        best_i = jnp.sum(jnp.where(is_min & first, ids, 0), axis=0)  # [N]
        invalid = (best_d > radius * radius) | ~jnp.isfinite(best_d) | ~qm
        dists = jnp.where(invalid, INF, best_d)[:, None]
        out_i = jnp.where(invalid, grid_mod.INVALID_ID, best_i)[:, None]
        xyz = jnp.where(invalid[:, None], 0.0, selT[:3].T)[:, None, :]
        nrm = jnp.where(invalid[:, None], 0.0, selT[_NRM].T)[:, None, :]
        return dists, out_i, xyz, nrm

    @jax.jit
    def gather_only(cl, q, qm, dq):
        rows, valid = cell_mod.gather_cell_candidates(cl, q + dq, qm)
        return rows

    # Correctness: identical winners (up to f32 ties).
    za = variant_a(cl, q, qm, jnp.zeros(3))
    zb = variant_b(cl, q, qm, jnp.zeros(3))
    ia, ib = np.asarray(za[1])[:, 0], np.asarray(zb[1])[:, 0]
    agree = np.mean(ia == ib)
    da, db = np.asarray(za[0])[:, 0], np.asarray(zb[0])[:, 0]
    fin = np.isfinite(da) & np.isfinite(db)
    log(f"winner agreement: {agree:.6f}  d2 max|diff|: "
        f"{np.max(np.abs(da[fin] - db[fin])):.2e}  "
        f"valid_a={np.isfinite(da).sum()} valid_b={np.isfinite(db).sum()}")

    def timeit(name, fn, outs=None):
        dq = jnp.asarray(np.zeros(3, np.float32))
        out = fn(cl, q, qm, dq)
        sync(out[0] if isinstance(out, tuple) else out)
        ts = []
        prev = 0.0
        for _ in range(7):
            t0 = time.perf_counter()
            for _ in range(3):
                # chain: derive dq from previous output to serialize
                dqq = dq + prev * 1e-12
                out = fn(cl, q, qm, dqq)
                prev = (out[0] if isinstance(out, tuple) else out).ravel()[0]
            sync(out[0] if isinstance(out, tuple) else out)
            ts.append((time.perf_counter() - t0 - rt) / 3)
        med = float(np.median(ts)) * 1e3
        log(f"{name}: {med:.2f} ms")
        return med

    timeit("gather only", gather_only)
    timeit("A gather+rank [N,48,8]", variant_a)
    timeit("B gather+transpose+rank [8,48,N]", variant_b)
    log("done")


if __name__ == "__main__":
    main()
