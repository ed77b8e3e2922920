"""Pallas TPU kernel: fused pair-cached GN iteration.

One streaming pass over the cached correspondences of a pair-cached ICP
round (``models/icp.py round_body``): transform the reading points by the
current pose, compute pair distances, apply the round-frozen TrimmedDist
threshold, and accumulate the full point-to-plane normal equations — A's
upper triangle (21), b (6), and the convergence statistics — in VMEM
scratch without materializing any [N, K] intermediate in HBM.

Layout: pair-major SoA transposed to ``[K, N]`` so a VPU tile covers
``K=8`` sublanes x 128 reading points per lane; the reading coordinates
ride along as ``[1, N]`` rows broadcast across the pair sublanes. The
revisited-output-accumulator pattern (single output block, ``@pl.when``
init on step 0) makes the grid a pure sequential reduction.

The XLA fallback (broadcast normal equations in ``models/minimizers.py``)
remains the default; this kernel is the hand-scheduled variant for the hot
bench configuration (point-to-plane, scalar radius, frozen trimming).
Reference semantics: PointToPlane.cpp normal equations on TrimmedDist
weights (identical sums, single f32 accumulation order per tile).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Output slots in the [1, 128] accumulator row.
_N_A = 21  # upper triangle of the 6x6
_N_B = 6
_SLOT_SUMW = 27
_SLOT_SUMWR2 = 28
_SLOT_NPAIR = 29  # weighted pair count (== sum w here; kept for clarity)
_SLOT_NVALID = 30  # pairs passing radius+validity (overlap numerator)
_N_OUT = 31


def _kernel(t_ref, qx, qy, qz, nx, ny, nz, vv, rr, out_ref):
    """Blocks: t [8, 128] params (row 0 used); pair arrays [K, T]; reading
    coords [8, T] (rows 0..2 = x/y/z); out [8, 128] accumulated across the
    grid (row 0 used). All blocks are >= (8, 128) f32 tiles — no sublane-1
    layouts, which Mosaic handles poorly.

    Each grid step writes its own partial-sum block (summed by XLA after
    the call): a revisited accumulator with ``program_id(0) == 0`` init
    breaks under vmap, whose batching rule prepends a batch grid dim that
    shifts what ``program_id(0)`` means."""
    t = t_ref[0]
    # Transformed reading point (broadcast rows [1, T]).
    x, y, z = rr[0:1, :], rr[1:2, :], rr[2:3, :]
    sx = t[0] * x + t[1] * y + t[2] * z + t[3]
    sy = t[4] * x + t[5] * y + t[6] * z + t[7]
    sz = t[8] * x + t[9] * y + t[10] * z + t[11]
    tau = t[12]
    max_d2 = t[13]

    dx = sx - qx[:]
    dy = sy - qy[:]
    dz = sz - qz[:]
    d2 = dx * dx + dy * dy + dz * dz
    valid = vv[:] > 0.0
    ok = valid & (d2 <= max_d2)
    w = jnp.where(ok & (d2 <= tau), 1.0, 0.0)

    nxv, nyv, nzv = nx[:], ny[:], nz[:]
    r = dx * nxv + dy * nyv + dz * nzv
    # J = [s x n ; n]
    cx = sy * nzv - sz * nyv
    cy = sz * nxv - sx * nzv
    cz = sx * nyv - sy * nxv

    cols = (cx, cy, cz, nxv, nyv, nzv)
    vals = []
    k = 0
    for a in range(6):
        wa = w * cols[a]
        for b in range(a, 6):
            vals.append(jnp.sum(wa * cols[b]))
            k += 1
    for a in range(6):
        vals.append(-jnp.sum(w * cols[a] * r))
    vals.append(jnp.sum(w))
    vals.append(jnp.sum(w * r * r))
    vals.append(jnp.sum(w))
    vals.append(jnp.sum(ok.astype(jnp.float32)))
    # Scatter-free output row: Mosaic has no scatter lowering, so place
    # each scalar with a vectorized lane/sublane mask.
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    accum = jnp.zeros((8, 128), jnp.float32)
    for s, v in enumerate(vals):
        accum = accum + jnp.where((sub == 0) & (lane == s), v, 0.0)
    out_ref[:] = accum


def prepare_pairs(reading_xyz, pair_xyz, pair_normals, pair_valid, tile=512):
    """Once-per-round SoA prep: [N,K,*] pairs -> [8, Npad] rows.

    The transposes cost one pass over the pair arrays; the per-iteration
    kernel then streams them with zero layout work. K <= 8 is padded to
    the 8-sublane tile with invalid slots."""
    n, k, _ = pair_xyz.shape
    if k > 8:
        raise ValueError("fused pair kernel supports K <= 8")
    pad = (-n) % tile
    kpad = 8 - k
    if pad:
        reading_xyz = jnp.pad(reading_xyz, ((0, pad), (0, 0)))
        pair_xyz = jnp.pad(pair_xyz, ((0, pad), (0, 0), (0, 0)))
        pair_normals = jnp.pad(pair_normals, ((0, pad), (0, 0), (0, 0)))
        pair_valid = jnp.pad(pair_valid, ((0, pad), (0, 0)))
    if kpad:
        pair_xyz = jnp.pad(pair_xyz, ((0, 0), (0, kpad), (0, 0)))
        pair_normals = jnp.pad(pair_normals, ((0, 0), (0, kpad), (0, 0)))
        pair_valid = jnp.pad(pair_valid, ((0, 0), (0, kpad)))
    npad = n + pad
    qx = pair_xyz[..., 0].T
    qy = pair_xyz[..., 1].T
    qz = pair_xyz[..., 2].T
    nx = pair_normals[..., 0].T
    ny = pair_normals[..., 1].T
    nz = pair_normals[..., 2].T
    vv = pair_valid.astype(jnp.float32).T
    rrows = jnp.zeros((8, npad), jnp.float32)
    rrows = rrows.at[0].set(reading_xyz[:, 0])
    rrows = rrows.at[1].set(reading_xyz[:, 1])
    rrows = rrows.at[2].set(reading_xyz[:, 2])
    return (qx, qy, qz, nx, ny, nz, vv, rrows)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def pair_gn_step(soa, T, trim_limit, max_d2, tile: int = 512, interpret: bool = False):
    """One fused GN linearization over prepped pairs.

    Returns (A [6,6], b [6], sum_w, sum_wr2, n_radius_ok) — the sums of
    ``minimizers.point_to_plane_normal_equations_bc`` with weights
    ``valid & d2<=max_d2 & d2<=trim_limit`` (tile-local f32 accumulation,
    ~1e-6 relative agreement with the XLA path)."""
    qx, qy, qz, nx, ny, nz, vv, rrows = soa
    npad = qx.shape[1]

    params = jnp.zeros((8, 128), jnp.float32)
    params = params.at[0, :12].set(T[:3, :].reshape(-1).astype(jnp.float32))
    params = params.at[0, 12].set(jnp.asarray(trim_limit, jnp.float32))
    params = params.at[0, 13].set(jnp.asarray(max_d2, jnp.float32))

    grid = (npad // tile,)
    k = qx.shape[0]
    pair_spec = pl.BlockSpec((k, tile), lambda i: (0, i), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pair_spec, pair_spec, pair_spec,
            pair_spec, pair_spec, pair_spec,
            pair_spec,
            pl.BlockSpec((8, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8 * grid[0], 128), jnp.float32),
        interpret=interpret,
    )(params, qx, qy, qz, nx, ny, nz, vv, rrows)

    flat = jnp.sum(out.reshape(grid[0], 8, 128)[:, 0, :], axis=0)
    A = jnp.zeros((6, 6), jnp.float32)
    s = 0
    for a in range(6):
        for b in range(a, 6):
            A = A.at[a, b].set(flat[s])
            if a != b:
                A = A.at[b, a].set(flat[s])
            s += 1
    b_vec = flat[_N_A : _N_A + _N_B]
    return A, b_vec, flat[_SLOT_SUMW], flat[_SLOT_SUMWR2], flat[_SLOT_NVALID]


# ---------------------------------------------------------------------------
# knn=1 folded layout: the production chain matches 1 pair per point, so the
# [8, N] pair-major layout wastes 7 of 8 sublanes on padding and streams the
# reading coordinates as broadcast rows — 256 B/point/iteration. Folding the
# POINT axis into the sublanes ([N] -> [8, N/8], a free reshape) makes every
# sublane a distinct point: 10 dense [8, N/8] streams (pair xyz+normals,
# valid, reading xyz) = 40 B/point/iteration, 6.4x less HBM traffic. All
# kernel outputs are full reductions, so the layout change is exact.
# ---------------------------------------------------------------------------


def _kernel_folded(t_ref, qx, qy, qz, nx, ny, nz, vv, rx, ry, rz, out_ref):
    t = t_ref[0]
    sx = t[0] * rx[:] + t[1] * ry[:] + t[2] * rz[:] + t[3]
    sy = t[4] * rx[:] + t[5] * ry[:] + t[6] * rz[:] + t[7]
    sz = t[8] * rx[:] + t[9] * ry[:] + t[10] * rz[:] + t[11]
    tau = t[12]
    max_d2 = t[13]

    dx = sx - qx[:]
    dy = sy - qy[:]
    dz = sz - qz[:]
    d2 = dx * dx + dy * dy + dz * dz
    ok = (vv[:] > 0.0) & (d2 <= max_d2)
    w = jnp.where(ok & (d2 <= tau), 1.0, 0.0)

    nxv, nyv, nzv = nx[:], ny[:], nz[:]
    r = dx * nxv + dy * nyv + dz * nzv
    cx = sy * nzv - sz * nyv
    cy = sz * nxv - sx * nzv
    cz = sx * nyv - sy * nxv

    cols = (cx, cy, cz, nxv, nyv, nzv)
    vals = []
    for a in range(6):
        wa = w * cols[a]
        for b in range(a, 6):
            vals.append(jnp.sum(wa * cols[b]))
    for a in range(6):
        vals.append(-jnp.sum(w * cols[a] * r))
    vals.append(jnp.sum(w))
    vals.append(jnp.sum(w * r * r))
    vals.append(jnp.sum(w))
    vals.append(jnp.sum(ok.astype(jnp.float32)))
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    accum = jnp.zeros((8, 128), jnp.float32)
    for s, v in enumerate(vals):
        accum = accum + jnp.where((sub == 0) & (lane == s), v, 0.0)
    out_ref[:] = accum


def prepare_pairs_folded(reading_xyz, pair_xyz, pair_normals, pair_valid, tile=512):
    """knn=1 SoA prep: [N,1,*] pairs + [N,3] reading -> 10 x [8, Npad/8]
    folded rows (free reshapes — no transposes)."""
    n, k, _ = pair_xyz.shape
    if k != 1:
        raise ValueError("folded layout is knn=1 only")
    pad = (-n) % (8 * tile)
    if pad:
        reading_xyz = jnp.pad(reading_xyz, ((0, pad), (0, 0)))
        pair_xyz = jnp.pad(pair_xyz, ((0, pad), (0, 0), (0, 0)))
        pair_normals = jnp.pad(pair_normals, ((0, pad), (0, 0), (0, 0)))
        pair_valid = jnp.pad(pair_valid, ((0, pad), (0, 0)))
    m = (n + pad) // 8

    def fold(v):
        return v.reshape(8, m)

    return (
        fold(pair_xyz[:, 0, 0]), fold(pair_xyz[:, 0, 1]), fold(pair_xyz[:, 0, 2]),
        fold(pair_normals[:, 0, 0]), fold(pair_normals[:, 0, 1]), fold(pair_normals[:, 0, 2]),
        fold(pair_valid[:, 0].astype(jnp.float32)),
        fold(reading_xyz[:, 0]), fold(reading_xyz[:, 1]), fold(reading_xyz[:, 2]),
    )


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def pair_gn_step_folded(soa, T, trim_limit, max_d2, tile: int = 512, interpret: bool = False):
    """One fused GN linearization over knn=1 folded pairs (same sums as
    :func:`pair_gn_step`, 40 B/point streamed instead of 256 B)."""
    m = soa[0].shape[1]
    params = jnp.zeros((8, 128), jnp.float32)
    params = params.at[0, :12].set(T[:3, :].reshape(-1).astype(jnp.float32))
    params = params.at[0, 12].set(jnp.asarray(trim_limit, jnp.float32))
    params = params.at[0, 13].set(jnp.asarray(max_d2, jnp.float32))

    grid = (m // tile,)
    spec = pl.BlockSpec((8, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel_folded,
        grid=grid,
        in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)]
        + [spec] * 10,
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8 * grid[0], 128), jnp.float32),
        interpret=interpret,
    )(params, *soa)

    flat = jnp.sum(out.reshape(grid[0], 8, 128)[:, 0, :], axis=0)
    A = jnp.zeros((6, 6), jnp.float32)
    s = 0
    for a in range(6):
        for b in range(a, 6):
            A = A.at[a, b].set(flat[s])
            if a != b:
                A = A.at[b, a].set(flat[s])
            s += 1
    b_vec = flat[_N_A : _N_A + _N_B]
    return A, b_vec, flat[_SLOT_SUMW], flat[_SLOT_SUMWR2], flat[_SLOT_NVALID]


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def pair_gn_fused(
    reading_xyz: jax.Array,
    pair_xyz: jax.Array,
    pair_normals: jax.Array,
    pair_valid: jax.Array,
    T: jax.Array,
    trim_limit,
    max_d2,
    tile: int = 512,
    interpret: bool = False,
):
    """One-shot convenience wrapper: prep + one step (tests / ad-hoc use)."""
    soa = prepare_pairs(reading_xyz, pair_xyz, pair_normals, pair_valid, tile=tile)
    return pair_gn_step(soa, T, trim_limit, max_d2, tile=tile, interpret=interpret)
