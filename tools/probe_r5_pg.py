"""Round-5 probe: reconcile the 1024-node PCG solves/s numbers (bench
11.29 vs probe_posegraph 15, open since round 3) and A/B the
preconditioners — all in ONE process on bench-identical data.

Cases: {bench-exact graph (64 loops + 3009 short non-loops), probe graph
(1536 long loops alternating)} x {tridiag, jacobi} (+ a cg_tol variant).
"""
import dataclasses
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from open3d_slam_private_tpu.geometry import se3
from open3d_slam_private_tpu.slam import pose_graph as pg
from open3d_slam_private_tpu.utils.timing import relay_roundtrip


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def build_bench_graph(KB=1024, seed=11):
    """EXACTLY bench.py's graph_big construction."""
    rng_g = np.random.default_rng(seed)
    builder = pg.PoseGraphBuilder(node_capacity=KB, edge_capacity=4096)
    step_b = np.asarray(
        se3.exp_se3(jnp.asarray([0, 0, 2 * np.pi / KB, 0.4, 0, 0], jnp.float32)))
    gt_b, T_acc = [], np.eye(4, dtype=np.float32)
    for k in range(KB):
        builder.add_node(T_acc)
        gt_b.append(T_acc.copy())
        T_acc = (T_acc @ step_b).astype(np.float32)
    for k in range(KB - 1):
        nz = se3.exp_se3(jnp.asarray(
            np.r_[rng_g.normal(0, 0.001, 3), rng_g.normal(0, 0.005, 3)], jnp.float32))
        builder.add_edge(k, k + 1, np.linalg.inv(gt_b[k]) @ gt_b[k + 1] @ np.asarray(nz))
    for n in range(64):
        i = int(rng_g.integers(0, KB // 2))
        builder.add_edge(i, (i + KB // 2) % KB,
                         np.linalg.inv(gt_b[i]) @ gt_b[(i + KB // 2) % KB], is_loop=True)
    for n in range(4096 - (KB - 1) - 64):
        i = int(rng_g.integers(0, KB - 8))
        j = i + int(rng_g.integers(2, 8))
        builder.add_edge(i, j, np.linalg.inv(gt_b[i]) @ gt_b[j])
    return builder.build()


def build_probe_graph(K=1024, extra=3072, seed=11):
    """EXACTLY tools/probe_posegraph.py's construction."""
    rng = np.random.default_rng(seed)
    builder = pg.PoseGraphBuilder(node_capacity=K, edge_capacity=K + extra)
    step = np.asarray(se3.exp_se3(jnp.asarray([0, 0, 2 * np.pi / K, 0.4, 0, 0], jnp.float32)))
    gt, T = [], np.eye(4, dtype=np.float32)
    for k in range(K):
        builder.add_node(T)
        gt.append(T.copy())
        T = (T @ step).astype(np.float32)
    for k in range(K - 1):
        noise = se3.exp_se3(jnp.asarray(np.r_[rng.normal(0, 0.002, 3), rng.normal(0, 0.01, 3)], jnp.float32))
        builder.add_edge(k, k + 1, np.linalg.inv(gt[k]) @ gt[k + 1] @ np.asarray(noise))
    for n in range(extra):
        i = int(rng.integers(0, K - 8))
        j = i + int(rng.integers(2, 8)) if n % 2 else (i + K // 2) % K
        builder.add_edge(i, j, np.linalg.inv(gt[i]) @ gt[j], is_loop=(n % 2 == 0))
    return builder.build()


def main():
    rt = relay_roundtrip()
    log(f"relay rt={rt*1e3:.1f} ms dev={jax.devices()[0]}")
    jitter = jnp.asarray(se3.exp_se3(
        jnp.asarray([0.002, -0.001, 0.003, 0.01, -0.02, 0.01], jnp.float32)))

    g_bench = build_bench_graph()
    g_probe = build_probe_graph()

    cases = []
    for gname, graph in [("benchG", g_bench), ("probeG", g_probe)]:
        for pname, cfgkw in [
            ("tridiag", dict(pcg_precond="tridiag")),
            ("jacobi", dict(pcg_precond="jacobi")),
            ("tridiag tol3e-5", dict(pcg_precond="tridiag", cg_tol=3e-5)),
        ]:
            cfg = pg.PoseGraphConfig(iterations=15, solver="pcg", **cfgkw)

            def make(cfg):
                @jax.jit
                def run(g, poses):
                    g = dataclasses.replace(g, poses=poses @ jitter)
                    return pg.optimize(g, cfg).poses
                return run

            cases.append((f"{gname} {pname}", make(cfg), graph))

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=4) as ex:
        futs = [(name, ex.submit(lambda f=fn, g=graph: float(jnp.sum(f(g, g.poses)))))
                for name, fn, graph in cases]
        for name, f in futs:
            f.result()
            log(f"warm: {name} {time.perf_counter()-t0:.0f}s")

    for name, fn, graph in cases:
        out = fn(graph, graph.poses)
        float(jnp.sum(out))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(5):
                out = fn(graph, out)
            float(jnp.sum(out))
            ts.append((time.perf_counter() - t0 - rt) / 5)
        dt = float(np.median(ts))
        chi_out = float(pg.chi2(dataclasses.replace(graph, poses=out)))
        log(f"{name}: {1.0/dt:.2f} solves/s ({dt*1e3:.1f} ms) chi2_out={chi_out:.4f}")


if __name__ == "__main__":
    main()
