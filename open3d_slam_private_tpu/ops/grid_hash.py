"""Device spatial grid hash — the TPU replacement for both the libnabo
KD-tree (``MatchersImpl.cpp``, KNN correspondence search) and the CPU
``VoxelHashMap`` (``open3d_slam/include/open3d_slam/VoxelHashMap.hpp``,
``unordered_map<Vector3i, Voxel>``).

Design
------
No pointer chasing: the "tree build" is one argsort. Points are hashed by
their grid cell into ``T`` buckets of fixed capacity ``C``; point indices are
scattered into a flat ``[T * C]`` slot table using their rank within the
bucket (rank computed from the sorted hash keys). A KNN query reads the
2x2x2 block of cells nearest the query point (cell size = 2 * search radius
guarantees that block covers the radius), gathers up to ``8 * C`` candidate
ids, and resolves true squared distances — so hash collisions can only add
false candidates (filtered by distance), never wrong matches. The only
approximation is bucket overflow (> C points in one bucket drops the excess),
which tests bound statistically; size ``C`` generously for voxel-downsampled
maps.

Build is O(M log M) compare ops in one bitonic sort + O(M) scatter; query is
O(N * 8C) gathers + fused VPU distance math. Everything is static-shape and
jit/vmap-safe.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from open3d_slam_private_tpu.ops.knn import INVALID_ID, INF, KnnResult, _merge_topk

# Teschner-style spatial hash primes (large odd primes, standard choice).
_P1 = jnp.uint32(2654435761)
_P2 = jnp.uint32(805459861)
_P3 = jnp.uint32(3674653429)


def _cell_hash(cell: jax.Array, table_size: int) -> jax.Array:
    """Hash ``[..., 3]`` int32 cell coords into ``[0, table_size)``."""
    c = cell.astype(jnp.uint32)
    h = (c[..., 0] * _P1) ^ (c[..., 1] * _P2) ^ (c[..., 2] * _P3)
    h = h ^ (h >> 16)
    return (h % jnp.uint32(table_size)).astype(jnp.int32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GridHash:
    """Built spatial hash over a reference cloud.

    ``slots [T * C]``: point index per bucket slot, -1 = empty.
    ``cell_size``: scalar float (as a 0-d array so it can be donated/traced).
    """

    slots: jax.Array
    cell_size: jax.Array

    @property
    def table_size(self) -> int:
        return self.slots.shape[0] // self.bucket_cap

    @property
    def bucket_cap(self) -> int:
        # Static metadata is carried in aux data via the field below.
        return self._bucket_cap

    # dataclass field holding static python int (aux data, not a leaf).
    _bucket_cap: int = dataclasses.field(default=8, metadata=dict(static=True))


@functools.partial(jax.jit, static_argnames=("table_size", "bucket_cap"))
def build_grid(
    xyz: jax.Array,
    mask: jax.Array,
    cell_size,
    table_size: int = 1 << 16,
    bucket_cap: int = 16,
) -> GridHash:
    """Hash ``xyz [M, 3]`` (mask-valid points only) into a GridHash."""
    m = xyz.shape[0]
    cell_size = jnp.asarray(cell_size, xyz.dtype)
    cell = jnp.floor(xyz / cell_size).astype(jnp.int32)
    hkey = _cell_hash(cell, table_size)
    # Invalid points hash to the out-of-range sentinel bucket.
    hkey = jnp.where(mask, hkey, table_size)

    order = jnp.argsort(hkey)
    sorted_keys = hkey[order]
    # Rank of each sorted point within its equal-key run.
    first_pos = jnp.searchsorted(sorted_keys, sorted_keys, side="left")
    rank = jnp.arange(m, dtype=jnp.int32) - first_pos.astype(jnp.int32)

    in_table = (sorted_keys < table_size) & (rank < bucket_cap)
    slot_idx = jnp.where(in_table, sorted_keys * bucket_cap + rank, table_size * bucket_cap)
    slots = jnp.full((table_size * bucket_cap + 1,), INVALID_ID, jnp.int32)
    slots = slots.at[slot_idx].set(order.astype(jnp.int32), mode="drop")
    return GridHash(slots=slots[:-1], cell_size=cell_size, _bucket_cap=bucket_cap)


@functools.partial(jax.jit, static_argnames=("k",))
def grid_knn(
    grid: GridHash,
    ref_xyz: jax.Array,
    query_xyz: jax.Array,
    query_mask: jax.Array,
    k: int = 1,
    max_dist=None,
) -> KnnResult:
    """KNN within radius ``max_dist`` using the 2x2x2-cell block.

    Correct (up to bucket overflow) when ``max_dist <= cell_size / 2``; pass
    ``max_dist=None`` to use exactly ``cell_size / 2``. Matches the reference
    matcher contract: squared dists, ascending, -1/inf for no match.
    """
    n = query_xyz.shape[0]
    cap = grid.bucket_cap
    table_size = grid.slots.shape[0] // cap
    s = grid.cell_size
    if max_dist is None:
        radius = s * 0.5
    else:
        radius = jnp.asarray(max_dist, query_xyz.dtype)
    max_d2 = radius * radius

    u = query_xyz / s
    base_cell = jnp.floor(u).astype(jnp.int32)
    frac = u - jnp.floor(u)
    # Direction of the adjacent cell per axis: -1 if in lower half else +1.
    step = jnp.where(frac < 0.5, -1, 1).astype(jnp.int32)  # [N, 3]

    best_d = jnp.full((n, k), INF, query_xyz.dtype)
    best_i = jnp.full((n, k), 0, jnp.int32)

    q_sq = jnp.sum(query_xyz * query_xyz, axis=-1, keepdims=True)

    # Bucket hash per neighbor block; if two blocks collide into the same
    # bucket, visit it once (else its candidates would duplicate in top-k).
    hashes = []
    for bits in range(8):
        offs = jnp.array([(bits >> 2) & 1, (bits >> 1) & 1, bits & 1], jnp.int32)
        cell = base_cell + step * offs[None, :]
        hashes.append(_cell_hash(cell, table_size))

    for bits in range(8):
        h = hashes[bits]
        seen = jnp.zeros((n,), bool)
        for prev in range(bits):
            seen = seen | (h == hashes[prev])
        # Candidate point ids for this cell: [N, C].
        cand = grid.slots[h[:, None] * cap + jnp.arange(cap, dtype=jnp.int32)[None, :]]
        valid = (cand >= 0) & ~seen[:, None]
        cand_xyz = ref_xyz[jnp.maximum(cand, 0)]  # [N, C, 3]
        d2 = (
            q_sq
            - 2.0 * jnp.einsum("nd,ncd->nc", query_xyz, cand_xyz)
            + jnp.sum(cand_xyz * cand_xyz, axis=-1)
        )
        d2 = jnp.maximum(d2, 0.0)
        d2 = jnp.where(valid, d2, INF)
        if k == 1:
            blk_best = jnp.min(d2, axis=-1, keepdims=True)
            blk_arg = jnp.take_along_axis(
                cand, jnp.argmin(d2, axis=-1, keepdims=True), axis=-1
            )
            take = blk_best < best_d
            best_d = jnp.where(take, blk_best, best_d)
            best_i = jnp.where(take, blk_arg, best_i)
        else:
            kk = min(k, cap)
            neg_d, sel = jax.lax.top_k(-d2, kk)
            blk_ids = jnp.take_along_axis(cand, sel, axis=-1)
            best_d, best_i = _merge_topk(best_d, best_i, -neg_d, blk_ids, k)

    invalid = (best_d > max_d2) | ~jnp.isfinite(best_d) | ~query_mask[:, None]
    return KnnResult(
        dists=jnp.where(invalid, INF, best_d),
        ids=jnp.where(invalid, INVALID_ID, best_i),
    )
