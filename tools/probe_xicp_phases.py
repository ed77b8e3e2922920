"""Phase breakdown of the production X-ICP chain on TPU.

Times, at B=8 / 64k points (the bench headline config), each phase in
isolation with chained data dependencies:
  - fused pair-GN iteration (the in-round inner loop body)
  - per-round candidate gather + top-k match + trim freeze (round overhead)
  - the round-start X-ICP Optimized analysis (A0/b0 + alignment sums)
  - the coarse phase (20 iters @ stride 8)
  - the full chain (context)
Every big array is a jit ARGUMENT (closures embed HLO constants).
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
    from open3d_slam_private_tpu.models import minimizers
    from open3d_slam_private_tpu.models import localizability as xicp
    from open3d_slam_private_tpu.models.localizability import DegeneracyConfig
    from open3d_slam_private_tpu.kernels import pair_gn_pallas as pgk
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
        max_iterations=10, min_diff_rot=1e-3, min_diff_trans=8e-3,
        coarse_iterations=20, coarse_stride=8, candidate_refresh_every=10,
        candidate_slack=0.25, fused_kernel=True, fast_trimming=True,
        degeneracy=DegeneracyConfig(
            method="optimized",
            enough_information_threshold=250.0,
            insufficient_information_threshold=180.0,
        ),
    )

    scene = synth_scene(400_000)
    submap = pc.from_points(scene, capacity=512 * 1024)
    submap = voxel.voxel_downsample(submap, 0.15, capacity=131072)
    ngrid = grid_mod.build_grid(submap.padded_xyz(), submap.mask, 1.0, 1 << 17, 32)
    submap = normals_mod.estimate_normals_grid(
        submap, ngrid, knn=8, max_dist=0.5, orient_towards=(0.0, 0.0, 20.0)
    )
    ref = icp_mod.build_reference(submap, cfg)

    T_trues, scans = [], []
    for i in range(B):
        twist = np.array([0.01, -0.008, 0.012, 0.08, -0.05, 0.03], np.float32) * (1 + 0.1 * i)
        T_true = se3.exp_se3(jnp.asarray(twist))
        scans.append(pc.from_points(
            sample_scan(scene, N_READ, se3.transform_inverse(T_true), seed=i),
            capacity=N_READ))
        T_trues.append(np.asarray(T_true))
    readings = pc.stack(scans)
    perturb = jnp.asarray(se3.exp_se3(jnp.asarray(
        [0.012, -0.008, 0.015, 0.06, 0.05, -0.06], jnp.float32)))
    init_Ts = jnp.asarray(np.stack([T @ np.asarray(perturb) for T in T_trues]))

    rt = relay_roundtrip()
    print(f"relay rt {rt*1e3:.1f} ms", flush=True)

    def sync(x):
        return float(jnp.sum(x))

    # ---- programs (args only) ----
    @jax.jit
    def full_chain(reads, reference, Ts):
        res = jax.vmap(lambda r, T: icp_mod.icp_single(r, reference, T, cfg))(reads, Ts)
        return res.transform @ perturb, res.iterations

    # per-round selection: gather candidates + match + trim limit, batched.
    @jax.jit
    def round_select(reads, reference, Ts):
        def one(reading, T):
            src0 = se3.apply_transform(T, reading.xyz)
            rows, valid = cell_mod.gather_cell_candidates(reference.grid, src0, reading.mask)
            res0 = grid_mod.match_from_candidates(
                rows, valid, src0, reading.mask, cfg.max_match_dist, cfg.knn)
            tl = outliers.trimmed_dist_limit(
                res0.dists, res0.valid(), cfg.trimmed_ratio, cfg.max_match_dist**2)
            return res0.xyz, res0.normals, res0.ids, tl
        q, n, ids, tl = jax.vmap(one)(reads, Ts)
        return q, n, ids, tl, jnp.sum(q[..., 0]) * 1e-9

    # candidate gather alone
    @jax.jit
    def round_gather(reads, reference, Ts):
        def one(reading, T):
            src0 = se3.apply_transform(T, reading.xyz)
            rows, valid = cell_mod.gather_cell_candidates(reference.grid, src0, reading.mask)
            return jnp.sum(rows[..., 0]) * 1e-9 + jnp.sum(valid)
        return jax.vmap(one)(reads, Ts)

    # fused iteration: prep soa once (arg), then CH chained steps.
    CH = 10
    @jax.jit
    def fused_iters(soas, Ts, tls):
        def one(soa, T, tl):
            def body(T, _):
                A, b, sw, swr2, nok = pgk.pair_gn_step(soa, T, tl, cfg.max_match_dist**2)
                x = minimizers.solve_spd_unrolled(A, b)
                dT = minimizers.delta_transform_from_x(x)
                return dT @ T, sw
            T, _ = jax.lax.scan(body, T, None, length=CH)
            return T
        return jax.vmap(one)(soas, Ts, tls)

    # round-start optimized analysis (A0/b0 + alignment sums), batched
    @jax.jit
    def round_analysis(reads, qs, ns, idss, Ts, tls):
        def one(reading, q, n, ids, T, tl):
            src0 = se3.apply_transform(T, reading.xyz)
            d2 = jnp.sum((src0[:, None, :] - q) ** 2, axis=-1)
            valid = (ids >= 0) & (d2 <= cfg.max_match_dist**2)
            w = (valid & (d2 <= tl)).astype(jnp.float32).reshape(-1)
            A0, b0 = minimizers.point_to_plane_normal_equations_bc(
                src0, q, n, w.reshape(ids.shape))
            loc = xicp.analyze_optimized(
                A0, b0, jnp.repeat(src0, ids.shape[1], axis=0),
                n.reshape(-1, 3), valid.reshape(-1) & (w > 0), cfg.degeneracy,
                with_spectrum=False)
            return A0, loc.localizability_rot
        A0, lr = jax.vmap(one)(reads, qs, ns, idss, Ts, tls)
        return jnp.sum(A0) * 1e-9 + jnp.sum(lr)

    # coarse phase only
    coarse_cfg = dataclasses.replace(cfg, max_iterations=1, coarse_iterations=20)
    @jax.jit
    def coarse_only(reads, reference, Ts):
        def one(reading, T):
            r = icp_mod._strided(reading, cfg.coarse_stride)
            st = icp_mod._run_gn_loop(r, reference, T, cfg, cfg.coarse_iterations)
            return st["T"], st["it"]
        T, it = jax.vmap(one)(reads, Ts)
        return T, it

    # KKT solve alone (batched across lanes, CH chained): measures the
    # per-iteration constrained-solve overhead.
    @jax.jit
    def kkt_iters(As, bs, locs):
        def one(A, b, loc):
            def body(bb, _):
                x = xicp.solve_with_equality_constraints(A, bb, loc)
                return bb + x * 1e-6, x
            bb, _ = jax.lax.scan(body, b, None, length=CH)
            return bb
        return jax.vmap(one)(As, bs, locs)

    # ---- warm everything concurrently ----
    soa_list = []
    q0, n0, ids0, tl0, _ = round_select(readings, ref, init_Ts)
    soas = jax.vmap(lambda rx, q, n, ids: pgk.prepare_pairs(rx, q, n, ids >= 0))(
        readings.xyz, q0, n0, ids0)

    @jax.jit
    def analysis_for_kkt(reads, qs, ns, idss, Ts, tls):
        def one(reading, q, n, ids, T, tl):
            src0 = se3.apply_transform(T, reading.xyz)
            d2 = jnp.sum((src0[:, None, :] - q) ** 2, axis=-1)
            valid = (ids >= 0) & (d2 <= cfg.max_match_dist**2)
            w = (valid & (d2 <= tl)).astype(jnp.float32).reshape(-1)
            A0, b0 = minimizers.point_to_plane_normal_equations_bc(
                src0, q, n, w.reshape(ids.shape))
            loc = xicp.analyze_optimized(
                A0, b0, jnp.repeat(src0, ids.shape[1], axis=0),
                n.reshape(-1, 3), valid.reshape(-1) & (w > 0), cfg.degeneracy,
                with_spectrum=False)
            return A0, b0, loc
        return jax.vmap(one)(reads, qs, ns, idss, Ts, tls)

    warm = {
        "full": lambda: sync(full_chain(readings, ref, init_Ts)[0]),
        "select": lambda: sync(round_select(readings, ref, init_Ts)[4]),
        "gather": lambda: sync(round_gather(readings, ref, init_Ts)),
        "fused": lambda: sync(fused_iters(soas, init_Ts, tl0)),
        "analysis": lambda: sync(round_analysis(readings, q0, n0, ids0, init_Ts, tl0)),
        "coarse": lambda: sync(coarse_only(readings, ref, init_Ts)[0]),
        "kkt_in": lambda: sync(analysis_for_kkt(readings, q0, n0, ids0, init_Ts, tl0)[0]),
    }
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=4) as ex:
        futs = {k: ex.submit(f) for k, f in warm.items()}
        for k, f in futs.items():
            f.result()
            print(f"warm {k}: {time.perf_counter()-t0:.0f}s", flush=True)
    A0s, b0s, locs = analysis_for_kkt(readings, q0, n0, ids0, init_Ts, tl0)
    _ = sync(kkt_iters(A0s, b0s, locs))

    def timeit(fn, reps=5, inner=3):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(inner):
                out = fn()
            sync(out)
            ts.append((time.perf_counter() - t0 - rt) / inner)
        return float(np.median(ts)) * 1e3, float(np.subtract(*np.percentile(ts, [75, 25]))) * 1e3

    # full chain
    Ts = init_Ts
    def run_full():
        nonlocal Ts
        Ts, _ = full_chain(readings, ref, Ts)
        return Ts
    ms, iqr = timeit(run_full)
    _, iters = full_chain(readings, ref, init_Ts)
    print(f"full chain      : {ms:8.2f} ms/B8-call ({B*1e3/ms:.1f} reg/s) iqr {iqr:.2f} mean_it {float(jnp.mean(iters)):.1f}", flush=True)

    ms, iqr = timeit(lambda: round_select(readings, ref, init_Ts)[4])
    print(f"round select    : {ms:8.2f} ms/B8-call iqr {iqr:.2f}", flush=True)
    ms, iqr = timeit(lambda: round_gather(readings, ref, init_Ts))
    print(f"  gather only   : {ms:8.2f} ms/B8-call iqr {iqr:.2f}", flush=True)
    ms, iqr = timeit(lambda: fused_iters(soas, init_Ts, tl0))
    print(f"fused x{CH}       : {ms:8.2f} ms/B8-call ({ms/CH:.3f} ms/iter) iqr {iqr:.2f}", flush=True)
    ms, iqr = timeit(lambda: round_analysis(readings, q0, n0, ids0, init_Ts, tl0))
    print(f"round analysis  : {ms:8.2f} ms/B8-call iqr {iqr:.2f}", flush=True)
    ms, iqr = timeit(lambda: coarse_only(readings, ref, init_Ts)[0])
    print(f"coarse 20@8     : {ms:8.2f} ms/B8-call iqr {iqr:.2f}", flush=True)
    ms, iqr = timeit(lambda: kkt_iters(A0s, b0s, locs))
    print(f"kkt x{CH}         : {ms:8.2f} ms/B8-call ({ms/CH:.3f} ms/iter) iqr {iqr:.2f}", flush=True)


if __name__ == "__main__":
    main()
