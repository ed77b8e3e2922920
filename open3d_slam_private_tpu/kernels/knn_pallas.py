"""Pallas TPU kernel: streaming brute-force nearest neighbour.

A flash-attention-style formulation of exact 1-NN: reference tiles stream
through VMEM while a running (best distance, best id) pair stays resident in
the output block per query tile — the [N, M] distance matrix never exists.
The cross term rides the MXU as a K=128 matmul over coordinate-padded
layouts (xyz in the first 3 of 128 lanes; zero lanes contribute nothing),
which makes the kernel MXU-native where a [N,3]x[3,M] contraction would
waste the systolic array.

Grid = (query_tiles, ref_tiles) with the output block indexed by the query
tile only: TPU grids iterate the trailing dimension innermost, so the output
stays VMEM-resident across all reference tiles of one query tile (the
standard revisited-accumulator pattern).

This is the hand-scheduled counterpart of ``ops.knn.knn_bruteforce`` (same
semantics, k=1), reachable from the engine as ``ICPConfig(matcher=
"brute_pallas")`` — the dense matcher for workloads with no spatial
structure to hash (small skeleton scans against whole maps, verification
sweeps). The sparse cell-list (``ops.cell_list``) remains the scan-to-map
hot path — its measured XLA gather+rank already runs near the achievable
rate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _pad_lanes(xyz: jax.Array) -> jax.Array:
    """[N, 3] -> [N, 128] with zero lanes after xyz."""
    n = xyz.shape[0]
    out = jnp.zeros((n, LANES), xyz.dtype)
    return out.at[:, :3].set(xyz)


def _knn_kernel(q_ref, qsq_ref, r_ref, rsq_ref, dist_ref, idx_ref, *, r_tile):
    """Block shapes: q/qsq [QT, 128]; r/rsq [RT, 128]; out dist/idx [QT, 128]
    (lane 0 carries the value, other lanes mirror it)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dist_ref[:] = jnp.full_like(dist_ref, jnp.inf)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    q = q_ref[:]  # [QT, 128]
    qsq = qsq_ref[:, 0:1]  # [QT, 1]
    r_blk = r_ref[:]  # [RT, 128]
    rsq_row = rsq_ref[:, 0]  # [RT]

    # MXU: [QT, 128] x [RT, 128]^T (zero pad lanes are inert).
    cross = jax.lax.dot_general(
        q, r_blk,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d2 = qsq - 2.0 * cross + rsq_row[None, :]  # [QT, RT]
    tile_min = jnp.min(d2, axis=1)  # [QT]
    tile_arg = jnp.argmin(d2, axis=1).astype(jnp.int32) + j * r_tile

    cur = dist_ref[:, 0]
    take = tile_min < cur
    new_d = jnp.where(take, tile_min, cur)
    new_i = jnp.where(take, tile_arg, idx_ref[:, 0])
    dist_ref[:] = jnp.broadcast_to(new_d[:, None], dist_ref.shape)
    idx_ref[:] = jnp.broadcast_to(new_i[:, None], idx_ref.shape)


@functools.partial(jax.jit, static_argnames=("q_tile", "r_tile", "interpret"))
def knn_bruteforce_pallas(
    query_xyz: jax.Array,
    ref_xyz: jax.Array,
    q_tile: int = 256,
    r_tile: int = 512,
    interpret: bool = False,
):
    """Exact 1-NN: returns (squared dists [N], ids [N]).

    Sizes are padded to tile multiples internally; padded reference rows sit
    at a far sentinel so they never win.
    """
    n = query_xyz.shape[0]
    m = ref_xyz.shape[0]
    n_pad = (-n) % q_tile
    m_pad = (-m) % r_tile
    q = jnp.pad(query_xyz, ((0, n_pad), (0, 0)))
    r = jnp.pad(ref_xyz, ((0, m_pad), (0, 0)), constant_values=1.0e9)

    qp = _pad_lanes(q)
    rp = _pad_lanes(r)
    qsq = jnp.broadcast_to(
        jnp.sum(q * q, axis=1, keepdims=True), (q.shape[0], LANES)
    )
    rsq = jnp.broadcast_to(
        jnp.sum(r * r, axis=1, keepdims=True), (r.shape[0], LANES)
    )

    grid = (q.shape[0] // q_tile, r.shape[0] // r_tile)

    dist, idx = pl.pallas_call(
        functools.partial(_knn_kernel, r_tile=r_tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_tile, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r_tile, LANES), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r_tile, LANES), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((q_tile, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q.shape[0], LANES), jnp.float32),
            jax.ShapeDtypeStruct((q.shape[0], LANES), jnp.int32),
        ],
        interpret=interpret,
    )(qp, qsq, rp, rsq)
    return dist[:n, 0], idx[:n, 0]
