"""Pallas TPU kernel: fused candidate rank + winner select (knn=1).

The per-round correspondence selection is the production chain's hottest
step (VERDICT r2: 19.8 of 26.3 ms per B=8 call at 64k points). Its XLA
form works on ``[N, 48, 8]`` candidate tensors whose minor dim is 8 — 8 of
128 VPU lanes — and re-streams the 768 MB gathered-rows intermediate
several times (d2 pass, winner-extraction pass, validity pass).

This kernel keeps the gather in XLA (row-count-bound, ~76 M rows/s on
v5e — measured; neither row WIDTH nor locality changes it) and replaces
everything after it with ONE streaming pass over the flat ``[N, 384]``
layout:

- block = [Q, 384] queries x (cap * 8 payload channels), full lane tiles;
- per-candidate d2 by a ``[384, 48]`` segment-sum matmul on the MXU
  (channels 0..2 = xyz; padded slots carry xyz = 1e9 so their d2
  overflows any radius — validity needs no id decode);
- winner = first index attaining the min (cumsum tie-break, matching
  ``match_from_candidates``);
- winner-row extraction by a pick-mask expand (``[48, 384]`` matmul) and a
  ``[384, 8]`` channel-sum matmul;
- the id channel holds int32 BITCAST AS f32: multiplying/summing those
  patterns flushes denormals (any id < 2^23) to zero, so ids are
  extracted on an integer path (mask + lane sum), never through float
  arithmetic.

Output: ``[N, 8]`` = (x, y, z, id_bits, nx, ny, nz, d2) — the selected
pair per query, ~1/48th of the candidate bytes the XLA path re-streamed.

Reference semantics: KDTreeMatcher knn=1 maxDist (MatchersImpl.cpp) — the
same winner ``match_from_candidates`` picks (exact d2 tie-break parity is
not guaranteed through the MXU accumulation, but any flip is between
equidistant-to-f32 candidates).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from open3d_slam_private_tpu.ops.knn import INVALID_ID, INF

_CH = 8
_OUT = 16  # output lanes: x,y,z,id_bits,nx,ny,nz,d2,occupancy,7 spare
_Q = 512  # queries per tile: [512, 384] f32 = 786 KB VMEM per input block


def _build_mats(cap: int):
    lane = np.arange(cap * _CH)
    cand = lane // _CH
    ch = lane % _CH
    G = ((cand[:, None] == np.arange(cap)[None, :]) & (ch[:, None] < 3)).astype(np.float32)
    E = (np.arange(cap)[:, None] == cand[None, :]).astype(np.float32)  # [cap, L]
    H = (ch[:, None] == np.arange(_CH)[None, :]).astype(np.float32)  # [L, 8]
    return G, E, H


def _kernel(rows_ref, q_ref, G_ref, E_ref, H_ref, out_ref):
    rows = rows_ref[:]  # [Q, L]
    q = q_ref[:]  # [Q, 8]: xyz, mask, 0...
    L = rows.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows.shape[0], L), 1)
    ch = lane % _CH
    # Query xyz broadcast into the ch<3 lanes of every candidate group.
    brq = jnp.zeros_like(rows)
    for k in range(3):
        brq = brq + jnp.where(ch == k, q[:, k : k + 1], 0.0)
    chm = (ch < 3).astype(jnp.float32)
    diff = (rows - brq) * chm
    d2 = jax.lax.dot_general(
        diff * diff, G_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Q, cap]
    valid_q = q[:, 3:4] > 0.0
    d2 = jnp.where(valid_q, d2, INF)
    bd = jnp.min(d2, axis=-1, keepdims=True)  # [Q, 1]
    # First index attaining the min (no cumsum in Mosaic): min over the
    # candidate iota masked to the argmin set.
    cand_iota = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    win = jnp.min(jnp.where(d2 <= bd, cand_iota, d2.shape[1]), axis=-1, keepdims=True)
    pick = (cand_iota == win).astype(jnp.float32)  # [Q, cap]
    pickexp = jax.lax.dot_general(
        pick, E_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Q, L]
    # Winner payload channels; the id channel (ch==3) must NOT ride the
    # float path (denormal flush), zero it here and extract it as int32.
    safe = jnp.where(ch == 3, 0.0, rows)
    sel = jax.lax.dot_general(
        safe * pickexp, H_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Q, 8]
    rows_i = jax.lax.bitcast_convert_type(rows, jnp.int32)
    idm = (ch == 3) & (pickexp > 0.5)
    sel_id = jnp.sum(jnp.where(idm, rows_i, 0), axis=-1, keepdims=True)  # [Q, 1]
    # Candidate-row occupancy (matcher saturation counter): payload slots
    # are empty iff their x channel carries the 1e9 PAD marker.
    occ = jnp.sum(jnp.where((ch == 0) & (rows < 1e8), 1.0, 0.0), axis=-1,
                  keepdims=True)  # [Q, 1]

    out = jnp.pad(sel, ((0, 0), (0, _OUT - _CH)))
    olane = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
    out = jnp.where(olane == 3,
                    jax.lax.bitcast_convert_type(sel_id, jnp.float32), out)
    out = jnp.where(olane == 7, bd, out)
    out = jnp.where(olane == 8, occ, out)
    out_ref[:] = out


@functools.partial(jax.jit, static_argnames=("interpret",))
def rank_select_rows(rows_flat, query_xyz, query_mask, interpret: bool = False):
    """Rank gathered candidate rows and select the knn=1 winner per query.

    rows_flat: [N, cap * 8] gathered cell-list rows (flat channel layout).
    Returns [N, 16]: x, y, z, id_bits(f32-bitcast int32), nx, ny, nz, d2,
    occupancy(candidates present in the row), 7 spare — d2 = +inf where no
    valid candidate (or masked query).
    """
    n, L = rows_flat.shape
    cap = L // _CH
    pad = (-n) % _Q
    if pad:
        rows_flat = jnp.pad(rows_flat, ((0, pad), (0, 0)))
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
        grid=grid,
        in_specs=[
            pl.BlockSpec((_Q, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_Q, _CH), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, cap), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cap, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, _CH), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_Q, _OUT), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, _OUT), jnp.float32),
        interpret=interpret,
    )(rows_flat, q8, jnp.asarray(G), jnp.asarray(E), jnp.asarray(H))
    return out[:n]


def match_result_from_selected(sel, query_mask, max_d2):
    """[N, 8] kernel output -> a knn=1 MatchResult (same contract as
    ``match_from_candidates``)."""
    from open3d_slam_private_tpu.ops.grid_hash import MatchResult

    bd = sel[:, 7]
    ids = jax.lax.bitcast_convert_type(sel[:, 3], jnp.int32)
    bad = (bd > max_d2) | ~jnp.isfinite(bd) | ~query_mask
    return MatchResult(
        dists=jnp.where(bad, INF, bd)[:, None],
        ids=jnp.where(bad, INVALID_ID, ids)[:, None],
        xyz=jnp.where(bad[:, None], 0.0, sel[:, :3])[:, None, :],
        normals=jnp.where(bad[:, None], 0.0, sel[:, 4:7])[:, None, :],
    )
