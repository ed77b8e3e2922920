"""Pallas TPU kernel: fused per-row DMA gather + rank + select (knn=1).

Round-4 successor to :mod:`select_pallas`. The r3 standalone rank kernel
lost in-chain because feeding it XLA-gathered rows forced the [N, 384]
candidate intermediate to MATERIALIZE in HBM (~98 MB per 64k problem,
re-streamed) — costing more than the ranking passes it saved. This kernel
removes the intermediate entirely: each block DMAs its queries' cell-list
rows directly from the HBM table into VMEM scratch (waves of 128
outstanding copies — measured on v5e to match XLA's ~78 M random rows/s
gather ceiling, `tools/probe_dma.py`) and ranks them in-VMEM with the
MXU segment-sum formulation proven in select_pallas.

HBM traffic per round drops from

    read table rows (1536 B/query) -> write [N, 384] -> re-stream it
    through d2 / winner / validity passes at 8/128-lane utilization

to

    read table rows (1536 B/query) -> write [N, 16] selected pairs.

Reference semantics: KDTreeMatcher knn=1 maxDist (``MatchersImpl.cpp:
86-131``) — the same winner ``match_from_candidates`` picks (d2 ties may
flip between f32-equidistant candidates through the MXU accumulation,
like select_pallas).

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
_Q = 512  # queries per grid block
_GROUP = 128  # outstanding DMAs per wave (v5e sweet spot; 256 HANGS)


def _build_mats(cap: int):
    lane = np.arange(cap * _CH)
    cand = lane // _CH
    ch = lane % _CH
    G = ((cand[:, None] == np.arange(cap)[None, :]) & (ch[:, None] < 3)).astype(np.float32)
    E = (np.arange(cap)[:, None] == cand[None, :]).astype(np.float32)
    H = (ch[:, None] == np.arange(_CH)[None, :]).astype(np.float32)
    return G, E, H


def _rank_block(rows, q, G, E, H):
    """[Q, L] candidate rows + [Q, 8] queries -> [Q, _OUT] selected pairs.

    Identical math to select_pallas._kernel (MXU segment-sum d2, iota-min
    winner, pick-mask payload extraction, integer-path id, occupancy)."""
    L = rows.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows.shape[0], L), 1)
    ch = lane % _CH
    brq = jnp.zeros_like(rows)
    for k in range(3):
        brq = brq + jnp.where(ch == k, q[:, k : k + 1], 0.0)
    chm = (ch < 3).astype(jnp.float32)
    diff = (rows - brq) * chm
    d2 = jax.lax.dot_general(
        diff * diff, G, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    valid_q = q[:, 3:4] > 0.0
    d2 = jnp.where(valid_q, d2, INF)
    bd = jnp.min(d2, axis=-1, keepdims=True)
    cand_iota = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    win = jnp.min(jnp.where(d2 <= bd, cand_iota, d2.shape[1]), axis=-1, keepdims=True)
    pick = (cand_iota == win).astype(jnp.float32)
    pickexp = jax.lax.dot_general(
        pick, E, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    safe = jnp.where(ch == 3, 0.0, rows)
    sel = jax.lax.dot_general(
        safe * pickexp, H, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    rows_i = jax.lax.bitcast_convert_type(rows, jnp.int32)
    idm = (ch == 3) & (pickexp > 0.5)
    sel_id = jnp.sum(jnp.where(idm, rows_i, 0), axis=-1, keepdims=True)
    occ = jnp.sum(jnp.where((ch == 0) & (rows < 1e8), 1.0, 0.0), axis=-1,
                  keepdims=True)
    out = jnp.pad(sel, ((0, 0), (0, _OUT - _CH)))
    olane = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
    out = jnp.where(olane == 3,
                    jax.lax.bitcast_convert_type(sel_id, jnp.float32), out)
    out = jnp.where(olane == 7, bd, out)
    out = jnp.where(olane == 8, occ, out)
    return out


def _kernel(h_ref, tab_ref, q_ref, G_ref, E_ref, H_ref, out_ref, rows_scr, sems):
    t = pl.program_id(0)

    def issue(k, g):
        i = g * _GROUP + k
        pltpu.make_async_copy(
            tab_ref.at[h_ref[t * _Q + i]], rows_scr.at[i], sems.at[k]
        ).start()
        return g

    def wait(k, g):
        i = g * _GROUP + k
        pltpu.make_async_copy(
            tab_ref.at[h_ref[t * _Q + i]], rows_scr.at[i], sems.at[k]
        ).wait()
        return g

    def wave(g, _):
        jax.lax.fori_loop(0, _GROUP, issue, g)
        jax.lax.fori_loop(0, _GROUP, wait, g)
        return 0

    jax.lax.fori_loop(0, _Q // _GROUP, wave, 0)
    out_ref[:] = _rank_block(rows_scr[:], q_ref[:], G_ref[:], E_ref[:], H_ref[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gather_select_flat(table_flat, h, query_xyz, query_mask, interpret=False):
    n = h.shape[0]
    L = table_flat.shape[1]
    cap = L // _CH
    pad = (-n) % _Q
    if pad:
        h = jnp.pad(h, ((0, pad),))
        query_xyz = jnp.pad(query_xyz, ((0, pad), (0, 0)))
        query_mask = jnp.pad(query_mask, ((0, pad),))
    npad = n + pad
    q8 = jnp.zeros((npad, _CH), jnp.float32)
    q8 = q8.at[:, :3].set(query_xyz.astype(jnp.float32))
    q8 = q8.at[:, 3].set(query_mask.astype(jnp.float32))
    G, E, H = _build_mats(cap)
    grid = (npad // _Q,)
    out = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),  # table stays in HBM
                pl.BlockSpec((_Q, _CH), lambda i, h: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, cap), lambda i, h: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cap, L), lambda i, h: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, _CH), lambda i, h: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((_Q, _OUT), lambda i, h: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((_Q, L), jnp.float32),
                pltpu.SemaphoreType.DMA((_GROUP,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((npad, _OUT), jnp.float32),
        interpret=interpret,
    )(h, table_flat, q8, jnp.asarray(G), jnp.asarray(E), jnp.asarray(H))
    return out[:n]


@jax.custom_batching.custom_vmap
def gather_select(table_flat, h, query_xyz, query_mask):
    """Fused DMA-gather + rank for knn=1 cell-list matching.

    table_flat: [T, cap * 8] f32 cell-list table (flat channel layout).
    h: [N] int32 row index per query (the query's cell hash; clamp masked
    queries to any valid row — their output is invalidated by the mask).
    Returns [N, 16] like ``select_pallas.rank_select_rows``.
    """
    return _gather_select_flat(
        table_flat, h, query_xyz, query_mask,
        interpret=jax.default_backend() != "tpu",
    )


@gather_select.def_vmap
def _gather_select_vmap(axis_size, in_batched, table_flat, h, query_xyz, query_mask):
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
        table_flat,
        h.reshape(axis_size * n),
        query_xyz.reshape(axis_size * n, 3),
        query_mask.reshape(axis_size * n),
    )
    return out.reshape(axis_size, n, _OUT), True
