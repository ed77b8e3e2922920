"""Dense map — running per-voxel aggregation.

Analogue of the reference ``VoxelizedPointCloud`` (``Voxel.hpp:38-75``,
``VoxelHashMap.hpp``): the dense map stores, per occupied voxel, the running
aggregate (mean position / normal / color + count) of every point ever
inserted, independent of the sparse matching submap. The reference maintains
it in a ``denseMapWorker`` thread; here insertion is one jitted
scatter-by-key step into fixed-capacity voxel banks.

Unlike :func:`ops.voxel.voxel_downsample` (which re-aggregates a batch from
scratch), this structure is *incremental*: counts accumulate across scans so
means stay unbiased, and voxel identity is stable (open addressing on the
packed cell key with linear probing resolved at insert time).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from open3d_slam_private_tpu.geometry import se3
from open3d_slam_private_tpu.ops.pointcloud import PointBatch
from open3d_slam_private_tpu.ops.voxel import _pack_keys


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DenseMapState:
    """Fixed-capacity voxel aggregate bank, keyed by packed cell keys."""

    key_hi: jax.Array  # [C] int32, occupied slots; MAXINT = free
    key_lo: jax.Array  # [C]
    sum_xyz: jax.Array  # [C, 3]
    sum_normal: jax.Array  # [C, 3]
    sum_color: jax.Array  # [C, 3]
    count: jax.Array  # [C] float32
    voxel_size: jax.Array  # scalar

    @property
    def capacity(self) -> int:
        return self.count.shape[0]

    def occupied(self) -> jax.Array:
        return self.count > 0


_FREE = jnp.int32(0x7FFFFFFF)


def create(capacity: int, voxel_size, dtype=jnp.float32) -> DenseMapState:
    return DenseMapState(
        key_hi=jnp.full((capacity,), _FREE, jnp.int32),
        key_lo=jnp.full((capacity,), _FREE, jnp.int32),
        sum_xyz=jnp.zeros((capacity, 3), dtype),
        sum_normal=jnp.zeros((capacity, 3), dtype),
        sum_color=jnp.zeros((capacity, 3), dtype),
        count=jnp.zeros((capacity,), dtype),
        voxel_size=jnp.asarray(voxel_size, dtype),
    )


@functools.partial(jax.jit, static_argnames=())
def insert(state: DenseMapState, scan: PointBatch, T_map_scan: jax.Array) -> DenseMapState:
    """Insert a posed scan: aggregate into existing voxels, claim free slots
    for new ones.

    Slot resolution is sort-based (no serial probing): existing keys and the
    scan's new unique keys are matched by a merge over the sorted key space;
    new keys claim free slots in order. Voxels beyond capacity are dropped
    (mask-counted, like every fixed bank in this stack).
    """
    cap = state.capacity
    posed = scan.transformed(T_map_scan)
    xyz = posed.xyz
    cell = jnp.floor(xyz / state.voxel_size).astype(jnp.int32)
    k_hi, k_lo = _pack_keys(cell)
    k_hi = jnp.where(scan.mask, k_hi, _FREE)
    k_lo = jnp.where(scan.mask, k_lo, _FREE)

    # Per-scan voxel aggregation first (one entry per distinct new cell).
    n = xyz.shape[0]
    order0 = jnp.argsort(k_lo, stable=True)
    order = order0[jnp.argsort(k_hi[order0], stable=True)]
    s_hi, s_lo = k_hi[order], k_lo[order]
    new_seg = jnp.concatenate(
        [jnp.ones((1,), bool), (s_hi[1:] != s_hi[:-1]) | (s_lo[1:] != s_lo[:-1])]
    )
    seg = jnp.cumsum(new_seg.astype(jnp.int32)) - 1
    s_mask = scan.mask[order]
    seg = jnp.where(s_mask, seg, n)
    ones = s_mask.astype(xyz.dtype)

    def seg_sum(v):
        return jax.ops.segment_sum(v, seg, num_segments=n + 1)[:n]

    agg_cnt = seg_sum(ones)
    agg_xyz = seg_sum(xyz[order] * ones[:, None])
    nrm = posed.extras.get("normals")
    agg_nrm = seg_sum(nrm[order] * ones[:, None]) if nrm is not None else jnp.zeros_like(agg_xyz)
    col = posed.extras.get("colors")
    agg_col = seg_sum(col[order] * ones[:, None]) if col is not None else jnp.zeros_like(agg_xyz)
    # Representative key per segment (first row of each run). INTEGER
    # segment sums: packed keys exceed 2^24, so routing them through f32
    # corrupts low bits (distinct cells silently merge).
    def seg_sum_i(v):
        return jax.ops.segment_sum(v, seg, num_segments=n + 1)[:n]

    agg_hi = seg_sum_i(jnp.where(new_seg, s_hi, 0))
    agg_lo = seg_sum_i(jnp.where(new_seg, s_lo, 0))
    agg_valid = agg_cnt > 0

    # Match scan voxels against existing bank keys EXACTLY: lexicographic
    # double-sort of the union (bank rows first, stable sorts keep them
    # before equal-key scan rows), then each scan row matches iff its
    # predecessor carries the same key and is a bank row.
    u_hi = jnp.concatenate([state.key_hi, jnp.where(agg_valid, agg_hi, _FREE)])
    u_lo = jnp.concatenate([state.key_lo, jnp.where(agg_valid, agg_lo, _FREE)])
    u_slot = jnp.concatenate(
        [jnp.arange(cap, dtype=jnp.int32), jnp.full((n,), -1, jnp.int32)]
    )
    u_row = jnp.concatenate(
        [jnp.full((cap,), -1, jnp.int32), jnp.arange(n, dtype=jnp.int32)]
    )
    o0 = jnp.argsort(u_lo, stable=True)
    uo = o0[jnp.argsort(u_hi[o0], stable=True)]
    sh, sl = u_hi[uo], u_lo[uo]
    sslot, srow = u_slot[uo], u_row[uo]
    prev_same = jnp.concatenate(
        [jnp.zeros((1,), bool), (sh[1:] == sh[:-1]) & (sl[1:] == sl[:-1])]
    )
    prev_slot = jnp.concatenate([jnp.full((1,), -1, jnp.int32), sslot[:-1]])
    matched_here = (srow >= 0) & prev_same & (prev_slot >= 0)
    # Scatter back to scan-row order.
    any_hit = jnp.zeros((n,), bool).at[jnp.maximum(srow, 0)].max(
        matched_here, mode="drop"
    ) & agg_valid
    slot_existing = jnp.zeros((n,), jnp.int32).at[jnp.maximum(srow, 0)].max(
        jnp.where(matched_here, prev_slot, 0), mode="drop"
    )

    # New voxels claim free slots in order.
    free = state.key_hi == _FREE
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    # slot index of the r-th free slot: scatter.
    free_slots = jnp.full((cap + 1,), cap, jnp.int32)
    free_slots = free_slots.at[jnp.where(free, free_rank, cap)].set(
        jnp.arange(cap, dtype=jnp.int32), mode="drop"
    )
    is_new = agg_valid & ~any_hit
    new_rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    slot_new = free_slots[jnp.clip(new_rank, 0, cap)]

    slot = jnp.where(any_hit, slot_existing, slot_new)
    ok = agg_valid & (slot < cap)
    slot = jnp.where(ok, slot, cap)  # dropped

    key_hi = state.key_hi.at[slot].set(jnp.where(ok, agg_hi, _FREE), mode="drop")
    key_lo = state.key_lo.at[slot].set(jnp.where(ok, agg_lo, _FREE), mode="drop")
    # Only overwrite keys for newly claimed slots; existing slots keep keys.
    key_hi = jnp.where(state.key_hi != _FREE, state.key_hi, key_hi[:cap])
    key_lo = jnp.where(state.key_lo != _FREE, state.key_lo, key_lo[:cap])

    wsel = ok.astype(xyz.dtype)
    sum_xyz = state.sum_xyz.at[slot].add(agg_xyz * wsel[:, None], mode="drop")
    sum_normal = state.sum_normal.at[slot].add(agg_nrm * wsel[:, None], mode="drop")
    sum_color = state.sum_color.at[slot].add(agg_col * wsel[:, None], mode="drop")
    count = state.count.at[slot].add(agg_cnt * wsel, mode="drop")

    return dataclasses.replace(
        state,
        key_hi=key_hi,
        key_lo=key_lo,
        sum_xyz=sum_xyz[:cap],
        sum_normal=sum_normal[:cap],
        sum_color=sum_color[:cap],
        count=count[:cap],
    )


def export(state: DenseMapState) -> PointBatch:
    """Materialize the aggregate means as a PointBatch."""
    denom = jnp.maximum(state.count, 1.0)[:, None]
    xyz = state.sum_xyz / denom
    mask = state.occupied()
    extras = {}
    nsum = state.sum_normal
    nn = jnp.linalg.norm(nsum, axis=-1, keepdims=True)
    extras["normals"] = jnp.where(nn > 1e-9, nsum / jnp.maximum(nn, 1e-9), 0.0)
    extras["colors"] = state.sum_color / denom
    return PointBatch(
        xyz=jnp.where(mask[:, None], xyz, 1.0e9), mask=mask, extras=extras
    )
