"""Masked point-cloud filters.

The TPU counterparts of the reference's two filter families:

- libpointmatcher ``DataPointsFilters`` (31 modules registered in
  ``pointmatcher/Registry.cpp:67-96``) — implemented here as mask
  transformations over a fixed-capacity :class:`PointBatch`;
- open3d_slam ``croppers.hpp`` (MaxRadius/MinRadius/Cylinder/BoundingBox
  cropping volumes, invertible and posable).

Every filter returns a new PointBatch with the same capacity; points are
"removed" by clearing mask bits (compact separately if a smaller static
shape is wanted). Sampling filters take an explicit PRNG key — reproducible
under jit and across hosts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from open3d_slam_private_tpu.ops.pointcloud import PointBatch, masked_quantile


# ---------------------------------------------------------------------------
# Distance / volume crops (DataPointsFilters MaxDist/MinDist/BoundingBox +
# open3d_slam croppers).
# ---------------------------------------------------------------------------


def max_dist(batch: PointBatch, dist, center=None) -> PointBatch:
    """Keep points with ||p - center|| <= dist (MaxDistDataPointsFilter /
    MaxRadiusCroppingVolume)."""
    xyz = batch.xyz if center is None else batch.xyz - jnp.asarray(center, batch.xyz.dtype)
    d2 = jnp.sum(xyz * xyz, axis=-1)
    return batch.with_mask(d2 <= jnp.asarray(dist, d2.dtype) ** 2)


def min_dist(batch: PointBatch, dist, center=None) -> PointBatch:
    """Keep points with ||p - center|| >= dist (MinDistDataPointsFilter /
    MinRadiusCroppingVolume)."""
    xyz = batch.xyz if center is None else batch.xyz - jnp.asarray(center, batch.xyz.dtype)
    d2 = jnp.sum(xyz * xyz, axis=-1)
    return batch.with_mask(d2 >= jnp.asarray(dist, d2.dtype) ** 2)


def min_max_radius(batch: PointBatch, rmin, rmax, center=None) -> PointBatch:
    """MinMaxRadiusCroppingVolume (croppers.hpp)."""
    return min_dist(max_dist(batch, rmax, center), rmin, center)


def axis_dist(batch: PointBatch, axis: int, dist, keep_inside: bool = True) -> PointBatch:
    """MaxDist on a single axis (dim=0/1/2 modes of MaxDistDataPointsFilter)."""
    v = jnp.abs(batch.xyz[..., axis])
    keep = v <= dist if keep_inside else v >= dist
    return batch.with_mask(keep)


def bounding_box(batch: PointBatch, lo, hi, remove_inside: bool = False) -> PointBatch:
    """BoundingBoxDataPointsFilter: axis-aligned box keep/remove."""
    lo = jnp.asarray(lo, batch.xyz.dtype)
    hi = jnp.asarray(hi, batch.xyz.dtype)
    inside = jnp.all((batch.xyz >= lo) & (batch.xyz <= hi), axis=-1)
    return batch.with_mask(~inside if remove_inside else inside)


def cylinder(batch: PointBatch, radius, half_height, center=None, remove_inside: bool = False) -> PointBatch:
    """CylinderCroppingVolume (croppers.hpp): vertical cylinder about center."""
    xyz = batch.xyz if center is None else batch.xyz - jnp.asarray(center, batch.xyz.dtype)
    in_r = (xyz[..., 0] ** 2 + xyz[..., 1] ** 2) <= jnp.asarray(radius) ** 2
    in_h = jnp.abs(xyz[..., 2]) <= half_height
    inside = in_r & in_h
    return batch.with_mask(~inside if remove_inside else inside)


def remove_nan(batch: PointBatch) -> PointBatch:
    """RemoveNaNDataPointsFilter: drop non-finite points."""
    finite = jnp.all(jnp.isfinite(batch.xyz), axis=-1)
    return batch.with_mask(finite)


def distance_limit(batch: PointBatch, axis: int = -1, dist: float = jnp.inf, keep_inside: bool = True) -> PointBatch:
    """DistanceLimitDataPointsFilter: radial (axis=-1) or per-axis limit."""
    if axis < 0:
        v = jnp.linalg.norm(batch.xyz, axis=-1)
    else:
        v = jnp.abs(batch.xyz[..., axis])
    keep = v < dist if keep_inside else v > dist
    return batch.with_mask(keep)


def max_quantile_on_axis(batch: PointBatch, axis: int, ratio: float) -> PointBatch:
    """MaxQuantileOnAxisDataPointsFilter: keep points below the ``ratio``
    quantile of the given coordinate."""
    v = batch.xyz[..., axis]
    limit = masked_quantile(v, batch.mask, ratio)
    return batch.with_mask(v <= limit)


# ---------------------------------------------------------------------------
# Sampling filters.
# ---------------------------------------------------------------------------


def random_sampling(batch: PointBatch, key: jax.Array, prob: float) -> PointBatch:
    """RandomSamplingDataPointsFilter: keep each valid point with prob."""
    u = jax.random.uniform(key, batch.mask.shape)
    return batch.with_mask(u < prob)


def max_point_count(batch: PointBatch, key: jax.Array, max_count: int) -> PointBatch:
    """MaxPointCountDataPointsFilter: if count > max_count, keep a uniform
    random subset of exactly max_count valid points."""
    n = batch.capacity
    u = jax.random.uniform(key, (n,))
    # Rank valid points by random score; keep the max_count smallest ranks.
    score = jnp.where(batch.mask, u, 2.0)
    order = jnp.argsort(score)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    keep = batch.mask & (rank < max_count)
    over = batch.count() > max_count
    return batch.with_mask(jnp.where(over, keep, batch.mask))


def fix_step_sampling(batch: PointBatch, step: int) -> PointBatch:
    """FixStepSamplingDataPointsFilter: keep every step-th point (by index)."""
    idx = jnp.arange(batch.capacity)
    return batch.with_mask((idx % step) == 0)


# ---------------------------------------------------------------------------
# Geometry-aware filters.
# ---------------------------------------------------------------------------


def shadow_filter(batch: PointBatch, eps: float = 0.1) -> PointBatch:
    """ShadowDataPointsFilter: remove points whose normal is almost
    perpendicular to the observation ray (veil points at depth edges).
    Requires ``normals``; sensor assumed at the origin (as in the reference,
    which uses the observation direction descriptor)."""
    normals = batch.extras["normals"]
    ray = batch.xyz / jnp.maximum(jnp.linalg.norm(batch.xyz, axis=-1, keepdims=True), 1e-12)
    cos = jnp.abs(jnp.sum(normals * ray, axis=-1))
    return batch.with_mask(cos > eps)


def incidence_angle(batch: PointBatch) -> PointBatch:
    """IncidenceAngleDataPointsFilter: store the incidence angle (angle
    between the viewing ray and the surface normal) as an extra channel."""
    normals = batch.extras["normals"]
    ray = -batch.xyz
    ray = ray / jnp.maximum(jnp.linalg.norm(ray, axis=-1, keepdims=True), 1e-12)
    cos = jnp.clip(jnp.abs(jnp.sum(normals * ray, axis=-1)), 0.0, 1.0)
    return batch.with_extras(incidenceAngles=jnp.arccos(cos)[:, None])


def observation_direction(batch: PointBatch, sensor=(0.0, 0.0, 0.0)) -> PointBatch:
    """ObservationDirectionDataPointsFilter: unit vector point -> sensor."""
    v = jnp.asarray(sensor, batch.xyz.dtype)[None, :] - batch.xyz
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    return batch.with_extras(observationDirections=v)


def orient_normals(batch: PointBatch, towards=(0.0, 0.0, 0.0)) -> PointBatch:
    """OrientNormalsDataPointsFilter: flip normals toward the viewpoint."""
    normals = batch.extras["normals"]
    to_vp = jnp.asarray(towards, batch.xyz.dtype)[None, :] - batch.xyz
    flip = jnp.sum(normals * to_vp, axis=-1, keepdims=True) < 0
    return batch.with_extras(normals=jnp.where(flip, -normals, normals))


def simple_sensor_noise(batch: PointBatch, gain: float = 1.0) -> PointBatch:
    """SimpleSensorNoiseDataPointsFilter (LMS-style model): noise grows
    linearly with range; stored as ``simpleSensorNoise`` channel."""
    d = jnp.linalg.norm(batch.xyz, axis=-1, keepdims=True)
    noise = gain * (0.0122 + 0.0007 * d)
    return batch.with_extras(simpleSensorNoise=noise)


def cut_at_descriptor_threshold(
    batch: PointBatch, name: str, threshold, use_larger_than: bool = True
) -> PointBatch:
    """CutAtDescriptorThresholdDataPointsFilter: gate on an extra channel."""
    v = batch.extras[name][..., 0]
    keep = v <= threshold if use_larger_than else v >= threshold
    return batch.with_mask(keep)
