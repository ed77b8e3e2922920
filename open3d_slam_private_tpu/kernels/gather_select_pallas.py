"""Pallas TPU kernel: fused per-row DMA gather + rank + select (knn=1).

Round-4 successor to :mod:`select_pallas`. The r3 standalone rank kernel
lost in-chain because feeding it XLA-gathered rows forced the [N, 384]
candidate intermediate to MATERIALIZE in HBM (~98 MB per 64k problem,
re-streamed) — costing more than the ranking passes it saved. This kernel
removes the intermediate entirely: each block DMAs its queries' cell-list
rows directly from the HBM table into VMEM scratch (waves of 128
outstanding copies — measured on v5e to match XLA's ~78 M random rows/s
gather ceiling, `tools/probe_dma.py`) and ranks them in-VMEM.

Table layout: ``[T, 8, 128]`` — one aligned (8, 128) f32 tile per cell
(sublane = payload channel, lane = candidate slot; ``cap`` of 128 lanes
used, the rest carry the empty payload). A flat ``[T, cap * 8]`` table
cannot be row-gathered by DMA at all: Mosaic requires HBM slices aligned
to the (8, 128) tiling of the LAST TWO dims, so single-row slices of a
2-D table are rejected — the leading dim of a 3-D tile-shaped table is
the only legal per-row slicing axis. The tile layout also turns ranking
into full-lane VPU math (candidates ARE the lane axis): distance, winner
pick, and payload extraction are plain masked reductions — no MXU
segment-sum matrices, no 8/128-lane utilization cliff.

HBM traffic per round: read one 4 KiB tile per query (the DMA engine is
descriptor-bound at these row sizes, so the 48->128 lane padding costs
no wall time — probe_dma measures the same rows/s at 1.5 KiB and 4 KiB)
-> write [N, 16] selected pairs. No [N, cap, 8] intermediate.

Reference semantics: KDTreeMatcher knn=1 maxDist (``MatchersImpl.cpp:
86-131``) — the same winner ``match_from_candidates`` picks.

vmap support: a ``custom_vmap`` rule flattens the batch into the query
axis (the table must be the shared, unbatched reference), so the kernel
composes with the vmapped production chain.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from open3d_slam_private_tpu.ops.knn import INF, INVALID_ID  # noqa: F401 (INF used)

_CH = 8
_OUT = 16  # x, y, z, id_bits, nx, ny, nz, d2, occupancy, 7 spare
_LANE = 128  # candidate lanes per cell tile (cap <= 128)
_Q = 512  # queries per grid block
_GROUP = 128  # outstanding DMAs per wave (v5e sweet spot; 256 HANGS)
_CHUNK = 1 << 17  # max queries per pallas_call (scalar-prefetch SMEM cap)


def _rank_block(rows, q):
    """[Q, 8, 128] candidate tiles + [Q, 8] queries -> [Q, _OUT] pairs.

    Channels on the sublane axis, candidates on the lane axis: every
    reduction below runs at full 128-lane utilization."""
    Q = rows.shape[0]
    sub = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
    diff = rows - q[:, :, None]
    d2 = jnp.sum(jnp.where(sub < 3, diff * diff, 0.0), axis=1)  # [Q, 128]
    rows_i = jax.lax.bitcast_convert_type(rows, jnp.int32)
    ids = jnp.sum(jnp.where(sub == 3, rows_i, 0), axis=1)  # [Q, 128]
    validc = ids >= 0
    valid_q = q[:, 3] > 0.0
    d2 = jnp.where(validc & valid_q[:, None], d2, INF)
    bd = jnp.min(d2, axis=-1, keepdims=True)  # [Q, 1]
    lane = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    win = jnp.min(jnp.where(d2 <= bd, lane, _LANE), axis=-1, keepdims=True)
    pick = (lane == win).astype(jnp.float32)  # [Q, 128] one-hot
    # Payload extraction: id channel zeroed on the float path (its bitcast
    # NaN patterns must never transit f32 arithmetic), integer path for id.
    # All reductions 2-D (Mosaic aborts on axis=(1,2) integer reductions
    # and on small-lane concat assembly — bisected in tools/probe_r4_kernel*).
    safe = jnp.where(sub == 3, 0.0, rows)
    sel = jnp.sum(safe * pick[:, None, :], axis=2)  # [Q, 8]
    sel_id = jnp.sum(jnp.where(pick > 0.5, ids, 0), axis=-1, keepdims=True)
    idf = jax.lax.bitcast_convert_type(sel_id, jnp.float32)  # [Q, 1]
    occ = jnp.sum(validc.astype(jnp.float32), axis=-1, keepdims=True)

    olane = jax.lax.broadcasted_iota(jnp.int32, (Q, _OUT), 1)
    out = jnp.zeros((Q, _OUT), jnp.float32)
    for c in (0, 1, 2, 4, 5, 6):
        out = jnp.where(olane == c, sel[:, c : c + 1], out)
    out = jnp.where(olane == 3, idf, out)
    out = jnp.where(olane == 7, bd, out)
    out = jnp.where(olane == 8, occ, out)
    return out


def _kernel(h_ref, tab_ref, q_ref, out_ref, scr, sems):
    # Double-buffered wave pipeline: while wave w's 128 tiles are ranked,
    # wave w+1's 128 DMAs are in flight (the serial issue->wait->rank-all
    # form ran at 2.5x BELOW the XLA path because every block paid full
    # DMA latency with the VPU idle). Outstanding copies stay <= 128 (256
    # hangs v5e); the wave loop is statically unrolled so every out/scr
    # slice is static.
    t = pl.program_id(0)
    nw = _Q // _GROUP

    def dma(slot, w, k):
        i = w * _GROUP + k
        return pltpu.make_async_copy(
            tab_ref.at[h_ref[t * _Q + i]], scr.at[slot, k], sems.at[k]
        )

    def issue_wave(w, slot):
        def body(k, _):
            dma(slot, w, k).start()
            return 0

        jax.lax.fori_loop(0, _GROUP, body, 0)

    def wait_wave(w, slot):
        def body(k, _):
            dma(slot, w, k).wait()
            return 0

        jax.lax.fori_loop(0, _GROUP, body, 0)

    issue_wave(0, 0)
    for w in range(nw):
        wait_wave(w, w % 2)
        if w + 1 < nw:
            issue_wave(w + 1, (w + 1) % 2)
        out_ref[w * _GROUP : (w + 1) * _GROUP, :] = _rank_block(
            scr[w % 2], q_ref[w * _GROUP : (w + 1) * _GROUP, :]
        )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gather_select_tiled(table_tiled, h, query_xyz, query_mask, interpret=False):
    n = h.shape[0]
    assert table_tiled.ndim == 3 and table_tiled.shape[1:] == (_CH, _LANE), (
        table_tiled.shape
    )
    pad = (-n) % _Q
    if pad:
        h = jnp.pad(h, ((0, pad),))
        query_xyz = jnp.pad(query_xyz, ((0, pad), (0, 0)))
        query_mask = jnp.pad(query_mask, ((0, pad),))
    npad = n + pad
    q8 = jnp.zeros((npad, _CH), jnp.float32)
    q8 = q8.at[:, :3].set(query_xyz.astype(jnp.float32))
    q8 = q8.at[:, 3].set(query_mask.astype(jnp.float32))
    # The scalar-prefetched index array must fit in SMEM: the compile
    # aborts once h crosses ~1 MiB (bisected in tools/probe_r4_gatherk5.py
    # — 131k queries OK, 262k+ not). Large query sets (the vmapped
    # production batch flattens to B*N) are CHUNKED into separate
    # pallas_calls of at most _CHUNK queries; the calls pipeline on device.
    def call(hc, qc):
        return pl.pallas_call(
            _kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(hc.shape[0] // _Q,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.ANY),  # table in HBM
                    pl.BlockSpec((_Q, _CH), lambda i, h: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((_Q, _OUT), lambda i, h: (i, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((2, _GROUP, _CH, _LANE), jnp.float32),
                    pltpu.SemaphoreType.DMA((_GROUP,)),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((hc.shape[0], _OUT), jnp.float32),
            interpret=interpret,
        )(hc, table_tiled, qc)

    if npad <= _CHUNK:
        out = call(h, q8)
    else:
        # npad and _CHUNK are both _Q multiples -> every slice is too.
        parts = []
        for s in range(0, npad, _CHUNK):
            e = min(s + _CHUNK, npad)
            parts.append(call(h[s:e], q8[s:e]))
        out = jnp.concatenate(parts, axis=0)
    return out[:n]


def tile_table(table: jax.Array) -> jax.Array:
    """Cell-list table ``[T, cap, 8]`` -> DMA-gatherable ``[T, 8, 128]``.

    Transposes channels onto the sublane axis and pads the candidate lane
    axis to 128 with the empty payload (coords far away, id = INVALID).
    One streaming pass over the table; loop-invariant in the ICP chain, so
    XLA hoists it out of the registration while-loop (built once per
    refreshed reference, like the table itself).
    """
    t, cap, ch = table.shape
    assert ch == _CH and cap <= _LANE, table.shape
    tabt = jnp.transpose(table, (0, 2, 1))  # [T, 8, cap]
    sub = jax.lax.broadcasted_iota(jnp.int32, (t, _CH, _LANE - cap), 1)
    inv = jax.lax.bitcast_convert_type(jnp.int32(INVALID_ID), jnp.float32)
    pad = jnp.where(sub == 3, inv, jnp.where(sub < 3, 1.0e9, 0.0))
    return jnp.concatenate([tabt, pad.astype(table.dtype)], axis=2)


@jax.custom_batching.custom_vmap
def gather_select(table_tiled, h, query_xyz, query_mask):
    """Fused DMA-gather + rank for knn=1 cell-list matching.

    table_tiled: [T, 8, 128] f32 cell-list table (:func:`tile_table`).
    h: [N] int32 row index per query (the query's cell hash; clamp masked
    queries to any valid row — their output is invalidated by the mask).
    Returns [N, 16] like ``select_pallas.rank_select_rows``.
    """
    return _gather_select_tiled(
        table_tiled, h, query_xyz, query_mask,
        interpret=jax.default_backend() != "tpu",
    )


@gather_select.def_vmap
def _gather_select_vmap(axis_size, in_batched, table_tiled, h, query_xyz, query_mask):
    tab_b, h_b, q_b, m_b = in_batched
    if tab_b:
        raise NotImplementedError(
            "gather_select: batched tables are unsupported (the table must "
            "be the shared reference; tile-sharded mode uses the XLA path)"
        )
    if not (h_b and q_b and m_b):
        # Broadcast unbatched query args across the batch.
        h = h if h_b else jnp.broadcast_to(h, (axis_size,) + h.shape)
        query_xyz = (
            query_xyz if q_b
            else jnp.broadcast_to(query_xyz, (axis_size,) + query_xyz.shape)
        )
        query_mask = (
            query_mask if m_b
            else jnp.broadcast_to(query_mask, (axis_size,) + query_mask.shape)
        )
    n = h.shape[1]
    out = gather_select(
        table_tiled,
        h.reshape(axis_size * n),
        query_xyz.reshape(axis_size * n, 3),
        query_mask.reshape(axis_size * n),
    )
    return out.reshape(axis_size, n, _OUT), True
