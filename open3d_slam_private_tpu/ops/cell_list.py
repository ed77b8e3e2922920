"""Precomputed cell candidate lists — the production matcher structure.

The 2x2x2 bucket grid (``grid_hash``) over-fetches badly when the map is
much denser than the search radius (bucket cell = 2 * radius holds tens of
points; capping drops true neighbours). The cell list moves that work to
build time, Verlet-list style:

- build: cells of side = search radius; for every occupied cell, collect ALL
  reference points within ``radius`` of any possible query in that cell
  (i.e. points in the 27-neighbourhood, distance-gated to the cell with
  margin) into a fixed-capacity payload list ``[T, C, 8]``
  (x, y, z, id, nx, ny, nz, 0);
- query: ONE contiguous row gather of the query's own cell list + pure VPU
  distance ranking. Exact within radius (up to list overflow, which the
  build gates by *distance* so near candidates win deterministically).

Build cost is a 27x-expanded sort + scatter, amortized over the reference
re-init period exactly like the reference's KD-tree rebuild
(``Mapper.cpp:329-347``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from open3d_slam_private_tpu.ops.grid_hash import _cell_hash, MatchResult, _CH, _IDX_CH, _NRM
from open3d_slam_private_tpu.ops.knn import INVALID_ID, INF

_PAD = 1.0e9


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CellList:
    """``table [T, C, 8]`` payload lists; ``cell_size`` = search radius."""

    table: jax.Array
    cell_size: jax.Array

    @property
    def list_cap(self) -> int:
        return self.table.shape[1]

    @property
    def table_size(self) -> int:
        return self.table.shape[0]


@functools.partial(jax.jit, static_argnames=("table_size", "list_cap"))
def build_cell_list(
    xyz: jax.Array,
    mask: jax.Array,
    radius,
    table_size: int = 1 << 16,
    list_cap: int = 64,
    normals: Optional[jax.Array] = None,
) -> CellList:
    """Build candidate lists for nearest-neighbour queries within ``radius``.

    A point p is listed in cell c iff ``dist(p, box(c)) <= radius`` — the
    exact condition for p to be a possible within-radius match of some query
    in c. Under capacity pressure, closest-to-cell-center points win.
    """
    m = xyz.shape[0]
    dtype = xyz.dtype
    radius = jnp.asarray(radius, dtype)
    cell = jnp.floor(xyz / radius).astype(jnp.int32)

    # 27 neighbour offsets: candidate (cell, point) pairs.
    offsets = jnp.asarray(
        [[i, j, k] for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)],
        jnp.int32,
    )  # [27, 3]
    tgt_cells = cell[:, None, :] + offsets[None, :, :]  # [M, 27, 3]

    # Distance from the point to the target cell's axis-aligned box
    # (eligibility) and to its center (retention priority — no ties, so
    # under capacity pressure each cell keeps a ball around its center).
    lo = tgt_cells.astype(dtype) * radius
    hi = lo + radius
    dx = jnp.maximum(jnp.maximum(lo - xyz[:, None, :], xyz[:, None, :] - hi), 0.0)
    box_d2 = jnp.sum(dx * dx, axis=-1)  # [M, 27]
    eligible = (box_d2 <= radius * radius) & mask[:, None]
    center = lo + 0.5 * radius
    ctr_d2 = jnp.sum((xyz[:, None, :] - center) ** 2, axis=-1)

    h = _cell_hash(tgt_cells, table_size)  # [M, 27]
    flat_h = jnp.where(eligible, h, table_size).reshape(-1)
    flat_d = ctr_d2.reshape(-1)
    flat_pt = jnp.repeat(jnp.arange(m, dtype=jnp.int32), 27)

    # Two-key stable sort: by distance first, then stable by hash.
    order0 = jnp.argsort(flat_d, stable=True)
    order = order0[jnp.argsort(flat_h[order0], stable=True)]
    s_h = flat_h[order]
    s_pt = flat_pt[order]

    # Rank within each equal-key run via cummax of run-start positions
    # (searchsorted is ~100x slower on TPU).
    first_flag = jnp.concatenate(
        [jnp.ones((1,), bool), s_h[1:] != s_h[:-1]]
    )
    idxs = jnp.arange(s_h.shape[0], dtype=jnp.int32)
    first_pos = jax.lax.cummax(jnp.where(first_flag, idxs, 0))
    rank = idxs - first_pos
    in_table = (s_h < table_size) & (rank < list_cap)
    slot = jnp.where(in_table, s_h * list_cap + rank, table_size * list_cap)

    payload = jnp.zeros((s_pt.shape[0], _CH), dtype)
    payload = payload.at[:, :3].set(xyz[s_pt])
    payload = payload.at[:, _IDX_CH].set(
        jax.lax.bitcast_convert_type(s_pt, jnp.float32)
    )
    if normals is not None:
        payload = payload.at[:, _NRM].set(normals[s_pt])

    empty = jnp.zeros((_CH,), dtype)
    empty = empty.at[:3].set(_PAD)
    empty = empty.at[_IDX_CH].set(
        jax.lax.bitcast_convert_type(jnp.int32(INVALID_ID), jnp.float32)
    )
    table = jnp.broadcast_to(empty, (table_size * list_cap + 1, _CH))
    table = table.at[slot].set(payload, mode="drop")
    return CellList(
        table=table[:-1].reshape(table_size, list_cap, _CH),
        cell_size=radius,
    )


@functools.partial(jax.jit, static_argnames=())
def gather_cell_candidates(cl: CellList, query_xyz: jax.Array, query_mask: jax.Array):
    """One row gather per query: ``rows [N, C, 8]``, ``valid [N, C]``."""
    table_size = cl.table_size
    cap = cl.list_cap
    cellq = jnp.floor(query_xyz / cl.cell_size).astype(jnp.int32)
    h = _cell_hash(cellq, table_size)
    flat = cl.table.reshape(table_size, cap * _CH)
    rows = flat[h].reshape(-1, cap, _CH)
    ids = jax.lax.bitcast_convert_type(rows[..., _IDX_CH], jnp.int32)
    valid = (ids >= 0) & query_mask[:, None]
    return rows, valid


@functools.partial(jax.jit, static_argnames=("k",))
def cell_match(
    cl: CellList,
    query_xyz: jax.Array,
    query_mask: jax.Array,
    k: int = 1,
    max_dist=None,
) -> MatchResult:
    """Exact within-radius KNN via the precomputed lists (one gather)."""
    from open3d_slam_private_tpu.ops.grid_hash import match_from_candidates

    radius = cl.cell_size if max_dist is None else jnp.asarray(max_dist, query_xyz.dtype)
    rows, valid = gather_cell_candidates(cl, query_xyz, query_mask)
    return match_from_candidates(rows, valid, query_xyz, query_mask, radius, k)
