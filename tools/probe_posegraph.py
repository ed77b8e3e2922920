"""A/B probe: dense vs block-sparse PCG pose-graph solver on the TPU."""
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


def build_graph(K, extra_edges, seed=11):
    rng = np.random.default_rng(seed)
    builder = pg.PoseGraphBuilder(node_capacity=K, edge_capacity=K + extra_edges)
    step = np.asarray(se3.exp_se3(jnp.asarray([0, 0, 2 * np.pi / K, 0.4, 0, 0], jnp.float32)))
    gt, T = [], np.eye(4, dtype=np.float32)
    for k in range(K):
        builder.add_node(T)
        gt.append(T.copy())
        T = (T @ step).astype(np.float32)
    for k in range(K - 1):
        noise = se3.exp_se3(jnp.asarray(np.r_[rng.normal(0, 0.002, 3), rng.normal(0, 0.01, 3)], jnp.float32))
        builder.add_edge(k, k + 1, np.linalg.inv(gt[k]) @ gt[k + 1] @ np.asarray(noise))
    for n in range(extra_edges):
        i = int(rng.integers(0, K - 8))
        j = i + int(rng.integers(2, 8)) if n % 2 else (i + K // 2) % K
        builder.add_edge(i, j, np.linalg.inv(gt[i]) @ gt[j], is_loop=(n % 2 == 0))
    return builder.build()


def main():
    rt = relay_roundtrip()
    print("relay rt ms:", rt * 1e3, "device:", jax.devices()[0], flush=True)
    jitter = jnp.asarray(se3.exp_se3(jnp.asarray([0.002, -0.001, 0.003, 0.01, -0.02, 0.01], jnp.float32)))
    
    CASES = []
    for K, E_extra in [(256, 32), (1024, 3072)]:
        graph = build_graph(K, E_extra)
        for solver in ["dense", "pcg"]:
            if K == 1024 and solver == "dense":
                continue  # 6144^2 dense factorization: not the production path
            cfg = pg.PoseGraphConfig(iterations=15, solver=solver)
    
            def make(cfg):
                @jax.jit
                def run(g, poses):
                    g = dataclasses.replace(g, poses=poses @ jitter)
                    return pg.optimize(g, cfg).poses
                return run
    
            CASES.append((f"K={K} E={K-1+E_extra} {solver}", make(cfg), graph))
    
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=4) as ex:
        futs = [(name, ex.submit(lambda f=fn, g=graph: float(jnp.sum(f(g, g.poses))))) for name, fn, graph in CASES]
        for name, f in futs:
            f.result()
            print("warm:", name, f"{time.perf_counter()-t0:.0f}s", flush=True)
    
    for name, fn, graph in CASES:
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
        iqr = float(np.subtract(*np.percentile(ts, [75, 25])))
        chi_in = float(pg.chi2(graph))
        chi_out = float(pg.chi2(dataclasses.replace(graph, poses=out)))
        print(f"{name}: {1.0/dt:.1f} solves/s ({dt*1e3:.2f} ms, iqr {iqr*1e3:.2f}) chi2 {chi_in:.2f}->{chi_out:.3f}", flush=True)


if __name__ == "__main__":
    main()
