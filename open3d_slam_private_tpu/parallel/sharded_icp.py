"""Sharded registration entry points.

Two scaling modes over a ("batch", "points") mesh:

- :func:`register_batch_sharded` — DP: B independent registrations sharded
  over the "batch" axis. Zero communication; linear scaling. This is the
  production throughput path (thousands of concurrent scan-to-map /
  hypothesis / multi-session problems).
- :func:`register_point_sharded` — SP/TP: ONE registration whose reading
  point axis is sharded over the "points" axis; each device matches its
  slice against the (replicated) reference and partial 6x6 normal-equation
  blocks are psum-reduced (42 floats/iteration — the Hessian-block
  all-reduce promised in SURVEY 2.6). Use for huge scans or when chips
  outnumber problems.

Both compose: a (batch, points) mesh runs B problems, each split P ways.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from open3d_slam_private_tpu.models import icp as icp_mod
from open3d_slam_private_tpu.ops.pointcloud import PointBatch


def register_batch_sharded(
    mesh: Mesh,
    readings: PointBatch,
    references: PointBatch,
    init_Ts: jax.Array,
    cfg: icp_mod.ICPConfig,
) -> icp_mod.ICPResult:
    """B-problem data parallelism: inputs sharded on their leading axis over
    "batch"; per-problem grid build + ICP run entirely on the owning device.
    """
    bsharding = NamedSharding(mesh, P("batch"))

    def put(tree):
        return jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P(*(("batch",) + (None,) * (x.ndim - 1))))),
            tree,
        )

    readings = put(readings)
    references = put(references)
    init_Ts = jax.device_put(init_Ts, NamedSharding(mesh, P("batch", None, None)))
    return icp_mod.register_batch(readings, references, init_Ts, cfg)


def register_point_sharded(
    mesh: Mesh,
    reading: PointBatch,
    reference: PointBatch,
    init_T: jax.Array,
    cfg: icp_mod.ICPConfig,
) -> icp_mod.ICPResult:
    """Single-problem point sharding via shard_map over the "points" axis.

    The reference cloud is replicated (each shard builds the same grid —
    cheaper than halo exchange at LiDAR map sizes); the reading is split.
    All reductions inside the ICP loop go through ``psum`` hooks enabled by
    ``cfg.shard_axis``.
    """
    n_shards = mesh.shape["points"]
    if reading.capacity % n_shards != 0:
        raise ValueError(
            f"reading capacity {reading.capacity} not divisible by points axis {n_shards}"
        )
    cfg_sharded = dataclasses.replace(cfg, shard_axis="points")

    pspec_read = jax.tree.map(lambda _: P("points"), reading)
    pspec_ref = jax.tree.map(lambda _: P(), reference)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(pspec_read, pspec_ref, P()),
        out_specs=jax.tree.map(lambda _: P(), _result_structure()),
        check_vma=False,
    )
    def run(reading_shard, reference_full, T0):
        ref = icp_mod.build_reference(reference_full, cfg_sharded)
        return icp_mod.icp_single(reading_shard, ref, T0, cfg_sharded)

    return jax.jit(run)(reading, reference, init_T)


def _result_structure():
    """A template ICPResult for out_specs tree mapping."""
    z = jnp.zeros(())
    return icp_mod.ICPResult(
        transform=z, iterations=z, converged=z, match_ratio=z,
        overlap_ratio=z, residual=z, eigenvalues=z, condition_number=z,
        localizability_rot=z, localizability_trans=z, degenerate=z, aborted=z,
        covariance=z,
    )
