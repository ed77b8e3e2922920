"""On-device pose-graph optimization.

TPU-native replacement for the reference's ``OptimizationProblem``
(``OptimizationProblem.cpp``), which delegates to Open3D's CPU
``GlobalOptimization`` (Levenberg-Marquardt). Here the whole solver is one
jitted Gauss-Newton/LM loop:

- nodes: fixed-capacity ``[K, 4, 4]`` submap poses + validity mask;
- edges: fixed-capacity arrays (i, j, measured relative pose, 6x6
  information, loop-closure flag, validity) — odometry edges certain,
  loop-closure edges robustified by Huber (≙ the certain/uncertain edge
  split at ``OptimizationProblem.cpp:50-121``);
- residual per edge: ``log(T_meas^-1 (T_i^-1 T_j))`` with exact per-edge
  Jacobians from forward-mode AD (vmapped), scatter-added into a dense
  ``6K x 6K`` Hessian — K is a few hundred submaps at most, so dense
  Cholesky on the MXU beats sparse bookkeeping;
- gauge: strong prior pinning node 0;
- multi-host: shard the edge arrays and psum (H, g) — the "pose-graph GN
  across a pod" configuration (``axis_name``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from open3d_slam_private_tpu.geometry import se3


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PoseGraph:
    """Fixed-capacity pose graph state."""

    poses: jax.Array  # [K, 4, 4]
    node_mask: jax.Array  # [K]
    edge_i: jax.Array  # [E] int32
    edge_j: jax.Array  # [E] int32
    edge_T: jax.Array  # [E, 4, 4] measured i_T_j
    edge_info: jax.Array  # [E, 6, 6] information matrices
    edge_is_loop: jax.Array  # [E] bool
    edge_mask: jax.Array  # [E] bool


@dataclasses.dataclass(frozen=True)
class PoseGraphConfig:
    iterations: int = 15
    damping: float = 1e-4  # LM lambda (scaled by diag)
    robust_kernel: str = "dcs"  # "dcs" | "huber" | "none" (loop edges only)
    huber_delta: float = 1.0  # kernel scale on loop-closure residual norm
    gauge_weight: float = 1e6


def empty_graph(num_nodes: int, num_edges: int, dtype=jnp.float32) -> PoseGraph:
    return PoseGraph(
        poses=jnp.broadcast_to(jnp.eye(4, dtype=dtype), (num_nodes, 4, 4)),
        node_mask=jnp.zeros((num_nodes,), bool),
        edge_i=jnp.zeros((num_edges,), jnp.int32),
        edge_j=jnp.zeros((num_edges,), jnp.int32),
        edge_T=jnp.broadcast_to(jnp.eye(4, dtype=dtype), (num_edges, 4, 4)),
        edge_info=jnp.broadcast_to(jnp.eye(6, dtype=dtype), (num_edges, 6, 6)),
        edge_is_loop=jnp.zeros((num_edges,), bool),
        edge_mask=jnp.zeros((num_edges,), bool),
    )


def _edge_residual(T_i, T_j, T_meas, xi_i, xi_j):
    """r(xi) = log( T_meas^-1 (T_i exp(xi_i))^-1 (T_j exp(xi_j)) )."""
    Ti = T_i @ se3.exp_se3(xi_i)
    Tj = T_j @ se3.exp_se3(xi_j)
    rel = se3.transform_inverse(Ti) @ Tj
    return se3.log_se3(se3.transform_inverse(T_meas) @ rel)


def _edge_terms(T_i, T_j, T_meas):
    """Residual at xi=0 and Jacobians wrt xi_i, xi_j (forward-mode AD)."""
    zero = jnp.zeros((6,), T_i.dtype)
    r = _edge_residual(T_i, T_j, T_meas, zero, zero)
    Ji = jax.jacfwd(lambda a: _edge_residual(T_i, T_j, T_meas, a, zero))(zero)
    Jj = jax.jacfwd(lambda b: _edge_residual(T_i, T_j, T_meas, zero, b))(zero)
    return r, Ji, Jj


def _robust_weight(r, info, is_loop, delta, kernel: str):
    """IRLS weight on the Mahalanobis norm of loop-closure residuals.

    "dcs" (Dynamic Covariance Scaling, Agarwal et al. 2013): the standard
    gross-outlier rejector for wrong loop closures — ``min(1, 2d^2/(d^2+X^2))
    squared``; unlike Huber it drives the weight to ~0 for large residuals,
    so a bogus loop cannot collapse a consistent chain (the failure mode the
    reference avoids by Open3D's edge pruning).
    """
    m2 = jnp.einsum("i,ij,j->", r, info, r)
    if kernel == "none":
        return jnp.ones(())
    if kernel == "huber":
        m = jnp.sqrt(jnp.maximum(m2, 1e-12))
        w = jnp.where(m <= delta, 1.0, delta / m)
    elif kernel == "dcs":
        d2 = delta * delta
        s = jnp.minimum(1.0, 2.0 * d2 / (d2 + m2))
        w = s * s
    else:
        raise ValueError(f"unknown robust kernel: {kernel}")
    return jnp.where(is_loop, w, 1.0)


@functools.partial(jax.jit, static_argnames=("cfg", "axis_name"))
def optimize(
    graph: PoseGraph,
    cfg: PoseGraphConfig = PoseGraphConfig(),
    axis_name: Optional[str] = None,
) -> PoseGraph:
    """Run GN/LM; returns the graph with optimized poses.

    With ``axis_name`` (inside shard_map), edge arrays are shard-local and
    (H, g) are psum-reduced; poses are replicated.
    """
    K = graph.poses.shape[0]
    dtype = graph.poses.dtype

    def allsum(v):
        return jax.lax.psum(v, axis_name) if axis_name is not None else v

    def gn_iter(poses, _):
        Ti = poses[graph.edge_i]
        Tj = poses[graph.edge_j]
        r, Ji, Jj = jax.vmap(_edge_terms)(Ti, Tj, graph.edge_T)
        w_h = jax.vmap(_robust_weight, in_axes=(0, 0, 0, None, None))(
            r, graph.edge_info, graph.edge_is_loop, cfg.huber_delta, cfg.robust_kernel
        )
        w = w_h * graph.edge_mask.astype(dtype)
        Wi = graph.edge_info * w[:, None, None]  # [E, 6, 6]

        JiW = jnp.einsum("eab,ebc->eac", jnp.swapaxes(Ji, 1, 2), Wi)
        JjW = jnp.einsum("eab,ebc->eac", jnp.swapaxes(Jj, 1, 2), Wi)
        Hii = JiW @ Ji
        Hij = JiW @ Jj
        Hjj = JjW @ Jj
        Hji = jnp.swapaxes(Hij, 1, 2)
        gi = jnp.einsum("eab,eb->ea", JiW, r)
        gj = jnp.einsum("eab,eb->ea", JjW, r)

        H = jnp.zeros((K, K, 6, 6), dtype)
        H = H.at[graph.edge_i, graph.edge_i].add(Hii)
        H = H.at[graph.edge_i, graph.edge_j].add(Hij)
        H = H.at[graph.edge_j, graph.edge_i].add(Hji)
        H = H.at[graph.edge_j, graph.edge_j].add(Hjj)
        g = jnp.zeros((K, 6), dtype)
        g = g.at[graph.edge_i].add(gi)
        g = g.at[graph.edge_j].add(gj)

        H = allsum(H)
        g = allsum(g)

        # Dense [6K, 6K]: transpose block layout then reshape.
        Hd = H.transpose(0, 2, 1, 3).reshape(6 * K, 6 * K)
        gd = g.reshape(6 * K)

        # Gauge prior on node 0 + inactive-node pinning + LM damping.
        diag_idx = jnp.arange(6 * K)
        gauge = jnp.zeros((6 * K,), dtype).at[:6].set(cfg.gauge_weight)
        inactive = jnp.repeat(~graph.node_mask, 6).astype(dtype) * cfg.gauge_weight
        damp = cfg.damping * (jnp.diagonal(Hd) + 1.0)
        Hd = Hd.at[diag_idx, diag_idx].add(gauge + inactive + damp)

        # Hd is SPD (gauge + inactive pinning + LM damping on the diagonal),
        # so Cholesky + triangular solves beat LU-with-pivoting on TPU.
        L = jnp.linalg.cholesky(Hd)
        y = jax.scipy.linalg.solve_triangular(L, gd, lower=True)
        dx = -jax.scipy.linalg.solve_triangular(L, y, lower=True, trans=1).reshape(K, 6)
        new_poses = poses @ se3.exp_se3(dx)
        return new_poses, jnp.sum((w * jnp.einsum("ei,eij,ej->e", r, graph.edge_info, r)))

    poses, costs = jax.lax.scan(gn_iter, graph.poses, None, length=cfg.iterations)
    return dataclasses.replace(graph, poses=poses)


def chi2(graph: PoseGraph) -> jax.Array:
    """Total weighted squared error of active edges (diagnostic)."""
    Ti = graph.poses[graph.edge_i]
    Tj = graph.poses[graph.edge_j]
    zero = jnp.zeros((graph.edge_i.shape[0], 6), graph.poses.dtype)
    r = jax.vmap(_edge_residual)(Ti, Tj, graph.edge_T, zero, zero)
    m2 = jnp.einsum("ei,eij,ej->e", r, graph.edge_info, r)
    return jnp.sum(jnp.where(graph.edge_mask, m2, 0.0))


# ---------------------------------------------------------------------------
# Host-side graph builder (≙ OptimizationProblem's edge bookkeeping).
# ---------------------------------------------------------------------------


class PoseGraphBuilder:
    """Accumulates nodes/edges on host, exports a device PoseGraph."""

    def __init__(self, node_capacity: int = 128, edge_capacity: int = 512):
        import numpy as np

        self.K = node_capacity
        self.E = edge_capacity
        self._np = np
        self.poses = np.tile(np.eye(4, dtype=np.float32), (node_capacity, 1, 1))
        self.node_count = 0
        self.edges = []

    def add_node(self, pose) -> int:
        if self.node_count >= self.K:
            raise ValueError("node capacity exceeded")
        self.poses[self.node_count] = self._np.asarray(pose, self._np.float32)
        self.node_count += 1
        return self.node_count - 1

    def add_edge(self, i: int, j: int, T_meas, info=None, is_loop=False) -> None:
        if len(self.edges) >= self.E:
            raise ValueError("edge capacity exceeded")
        info = self._np.eye(6, dtype=self._np.float32) if info is None else info
        self.edges.append((i, j, self._np.asarray(T_meas, self._np.float32), info, is_loop))

    def build(self) -> PoseGraph:
        np = self._np
        g = empty_graph(self.K, self.E)
        ei = np.zeros(self.E, np.int32)
        ej = np.zeros(self.E, np.int32)
        eT = np.tile(np.eye(4, dtype=np.float32), (self.E, 1, 1))
        einfo = np.tile(np.eye(6, dtype=np.float32), (self.E, 1, 1))
        eloop = np.zeros(self.E, bool)
        emask = np.zeros(self.E, bool)
        for n, (i, j, T, info, is_loop) in enumerate(self.edges):
            ei[n], ej[n], eT[n], einfo[n], eloop[n], emask[n] = i, j, T, info, is_loop, True
        nmask = np.zeros(self.K, bool)
        nmask[: self.node_count] = True
        return dataclasses.replace(
            g,
            poses=jnp.asarray(self.poses),
            node_mask=jnp.asarray(nmask),
            edge_i=jnp.asarray(ei),
            edge_j=jnp.asarray(ej),
            edge_T=jnp.asarray(eT),
            edge_info=jnp.asarray(einfo),
            edge_is_loop=jnp.asarray(eloop),
            edge_mask=jnp.asarray(emask),
        )
