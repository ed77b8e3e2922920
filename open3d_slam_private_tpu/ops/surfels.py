"""Surfel descriptors: Elipsoids and Gestalt, TPU-native.

Reference: ``libpointmatcher/pointmatcher/DataPointsFilters/Elipsoids.cpp``
(recursive box decomposition -> one surfel per box: center of mass, normal
from the smallest-eigenvalue eigenvector, eigenvalues, weights = point count,
Demantke shape parameters P/C/S, optional ``minPlanarity`` cull) and
``DataPointsFilters/Gestalt.cpp`` (keypoint subsampling + a 4 radial x 8
angular polar histogram of heights around each keypoint: per-bin mean and
variance, empty bins propagated inward -> 32+32 descriptor channels).

TPU design: instead of a pointer-chasing kd-box recursion, Elipsoids groups
points by voxel with the exact lexicographic double-sort used by
``ops.voxel`` and computes per-segment first and second moments via
``segment_sum`` — one fixed-shape pass, then the analytic ``eigh3x3``.
Gestalt computes all keypoint neighborhoods with one broadcast distance pass
and bins via flat scatter-adds into ``[K, 32]`` tables (no per-bin loops).

NOTE: the reference's Gestalt mean/variance accumulation statements are
commented out in its source (Gestalt.cpp:498-499,516 are dead code, so its
bins stay zero); we implement the documented intent — populated bins.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from open3d_slam_private_tpu.ops.normals import eigh3x3
from open3d_slam_private_tpu.ops.pointcloud import PAD_COORD, PointBatch
from open3d_slam_private_tpu.ops.voxel import _pack_keys

__all__ = ["elipsoids", "gestalt"]


@functools.partial(jax.jit, static_argnames=("capacity", "keep_covariances"))
def elipsoids(
    batch: PointBatch,
    box_size,
    min_planarity: float = 0.0,
    capacity: Optional[int] = None,
    keep_covariances: bool = False,
) -> PointBatch:
    """One surfel per occupied box of edge ``box_size``.

    Output extras: ``normals`` [C,3], ``eigenvalues`` [C,3] (descending),
    ``weights`` [C,1] (point count), ``shapes`` [C,3] = (planarity,
    cylindricality, sphericality) from trace-normalized eigenvalues
    (Elipsoids.cpp:423-431: P = 2(l1-l2), C = l0-l1, S = 3 l2 with
    descending order), optionally ``covariances`` [C,9]. Boxes failing
    ``min_planarity`` (Elipsoids.cpp:338-350) or with <3 points are dropped.
    """
    n = batch.capacity
    if capacity is None:
        capacity = n
    box_size = jnp.asarray(box_size, batch.xyz.dtype)

    cell = jnp.floor(batch.xyz / box_size).astype(jnp.int32)
    key_hi, key_lo = _pack_keys(cell)
    big = jnp.int32(0x7FFFFFFF)
    key_hi = jnp.where(batch.mask, key_hi, big)
    key_lo = jnp.where(batch.mask, key_lo, big)

    order0 = jnp.argsort(key_lo, stable=True)
    order = order0[jnp.argsort(key_hi[order0], stable=True)]
    s_hi, s_lo = key_hi[order], key_lo[order]
    s_xyz = batch.xyz[order]
    s_mask = batch.mask[order]

    new_seg = jnp.concatenate(
        [jnp.ones((1,), bool), (s_hi[1:] != s_hi[:-1]) | (s_lo[1:] != s_lo[:-1])]
    )
    seg_id = jnp.cumsum(new_seg.astype(jnp.int32)) - 1
    seg_id = jnp.where(s_mask, seg_id, capacity)

    ones = s_mask.astype(batch.xyz.dtype)
    counts = jax.ops.segment_sum(ones, seg_id, num_segments=capacity + 1)[:capacity]
    sums = jax.ops.segment_sum(
        s_xyz * ones[:, None], seg_id, num_segments=capacity + 1
    )[:capacity]
    # Second moment E[x x^T]; covariance = E[x x^T] - mu mu^T.
    xxT = s_xyz[:, :, None] * s_xyz[:, None, :] * ones[:, None, None]
    m2 = jax.ops.segment_sum(xxT, seg_id, num_segments=capacity + 1)[:capacity]

    denom = jnp.maximum(counts, 1.0)
    mean = sums / denom[:, None]
    cov = m2 / denom[:, None, None] - mean[:, :, None] * mean[:, None, :]

    evals, evecs = eigh3x3(cov)  # ascending
    # Descending order for the shape parameters.
    vals_desc = evals[:, ::-1]
    tr = jnp.maximum(jnp.sum(vals_desc, axis=-1), 1e-20)
    v = vals_desc / tr[:, None]
    planarity = 2.0 * (v[:, 1] - v[:, 2])
    cylindricality = v[:, 0] - v[:, 1]
    sphericality = 3.0 * v[:, 2]
    shapes = jnp.stack([planarity, cylindricality, sphericality], axis=-1)
    normal = evecs[:, :, 0]  # smallest eigenvalue eigenvector

    keep = (counts >= 3.0) & (planarity >= min_planarity)
    out_xyz = jnp.where(keep[:, None], mean, PAD_COORD)
    extras = {
        "normals": jnp.where(keep[:, None], normal, 0.0),
        "eigenvalues": jnp.where(keep[:, None], vals_desc, 0.0),
        "weights": jnp.where(keep[:, None], counts[:, None], 0.0),
        "shapes": jnp.where(keep[:, None], shapes, 0.0),
    }
    if keep_covariances:
        extras["covariances"] = jnp.where(
            keep[:, None], cov.reshape(capacity, 9), 0.0
        )
    return PointBatch(xyz=out_xyz, mask=keep, extras=extras)


_N_RADIAL = 4
_N_ANGULAR = 8
_N_BINS = _N_RADIAL * _N_ANGULAR


@functools.partial(jax.jit, static_argnames=())
def gestalt(
    batch: PointBatch,
    keypoints: jax.Array,
    keypoint_mask: jax.Array,
    radius,
) -> dict:
    """Gestalt polar height descriptor at each keypoint.

    For every keypoint: neighbors within ``radius`` (in XY), binned by
    4 radial rings (width radius/4, Gestalt.cpp:481-496) x 8 angular sectors
    (pi/4); per-bin mean and variance of point height z relative to the
    keypoint; empty rings inherit the next ring inward (Gestalt.cpp:520-530).
    Returns ``{"means": [K, 32], "variances": [K, 32], "normals": [K, 3]}``
    with the covariance normal of each neighborhood.
    """
    radius = jnp.asarray(radius, batch.xyz.dtype)
    kxyz = keypoints  # [K, 3]
    rel = batch.xyz[None, :, :] - kxyz[:, None, :]  # [K, N, 3]
    d_xy = jnp.sqrt(rel[..., 0] ** 2 + rel[..., 1] ** 2)
    valid = (
        batch.mask[None, :]
        & keypoint_mask[:, None]
        & (d_xy <= radius)
    )
    heights = rel[..., 2]

    # Neighborhood covariance -> surfel normal (for orientation gating).
    w = valid.astype(batch.xyz.dtype)
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    mu = jnp.einsum("kn,kni->ki", w, rel) / cnt[:, None]
    ctr = rel - mu[:, None, :]
    cov = jnp.einsum("kn,kni,knj->kij", w, ctr, ctr) / cnt[:, None, None]
    _, evecs = eigh3x3(cov)
    normals = evecs[:, :, 0]

    ring = jnp.minimum(
        jnp.floor(d_xy / (radius / _N_RADIAL)).astype(jnp.int32), _N_RADIAL - 1
    )
    ang = jnp.arctan2(rel[..., 1], rel[..., 0]) + jnp.pi  # [0, 2pi)
    sector = jnp.minimum(
        jnp.floor(ang / (jnp.pi / 4.0)).astype(jnp.int32), _N_ANGULAR - 1
    )
    k_idx = jnp.broadcast_to(
        jnp.arange(kxyz.shape[0], dtype=jnp.int32)[:, None], ring.shape
    )
    flat_bin = k_idx * _N_BINS + ring * _N_ANGULAR + sector
    flat_bin = jnp.where(valid, flat_bin, kxyz.shape[0] * _N_BINS)

    num = kxyz.shape[0] * _N_BINS + 1
    fb = flat_bin.reshape(-1)
    hw = (heights * w).reshape(-1)
    ww = w.reshape(-1)
    bin_cnt = jax.ops.segment_sum(ww, fb, num_segments=num)[:-1]
    bin_sum = jax.ops.segment_sum(hw, fb, num_segments=num)[:-1]
    bin_sq = jax.ops.segment_sum((heights**2 * w).reshape(-1), fb, num_segments=num)[:-1]
    cnt_b = jnp.maximum(bin_cnt, 1.0)
    means = (bin_sum / cnt_b).reshape(kxyz.shape[0], _N_RADIAL, _N_ANGULAR)
    varis = (bin_sq / cnt_b).reshape(kxyz.shape[0], _N_RADIAL, _N_ANGULAR) - means**2
    occupied = (bin_cnt > 0).reshape(kxyz.shape[0], _N_RADIAL, _N_ANGULAR)

    # Empty-ring propagation: ring r inherits ring r-1 (scan outward).
    def prop(carry, xs):
        m_prev, v_prev = carry
        m_r, v_r, occ_r = xs
        m_out = jnp.where(occ_r, m_r, m_prev)
        v_out = jnp.where(occ_r, v_r, v_prev)
        return (m_out, v_out), (m_out, v_out)

    zeros = jnp.zeros((kxyz.shape[0], _N_ANGULAR), batch.xyz.dtype)
    (_, _), (m_prop, v_prop) = jax.lax.scan(
        prop,
        (zeros, zeros),
        (
            jnp.moveaxis(means, 1, 0),
            jnp.moveaxis(varis, 1, 0),
            jnp.moveaxis(occupied, 1, 0),
        ),
    )
    means = jnp.moveaxis(m_prop, 0, 1).reshape(kxyz.shape[0], _N_BINS)
    varis = jnp.moveaxis(v_prop, 0, 1).reshape(kxyz.shape[0], _N_BINS)
    return {"means": means, "variances": varis, "normals": normals}
