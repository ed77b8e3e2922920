"""Multi-device tests on the virtual 8-CPU mesh (conftest forces
xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open3d_slam_private_tpu.geometry import se3
from open3d_slam_private_tpu.models import icp as icp_mod
from open3d_slam_private_tpu.ops import normals as normals_mod
from open3d_slam_private_tpu.ops import pointcloud as pc
from open3d_slam_private_tpu.parallel import make_mesh, register_batch_sharded, register_point_sharded

from tests.test_icp import BASE_CFG, make_surface_cloud, pose_error, small_transform, with_normals


def test_device_count():
    assert len(jax.devices()) == 8


def test_register_batch_sharded(rng):
    mesh = make_mesh(batch=8)
    B = 8
    readings, refs, trues = [], [], []
    for i in range(B):
        ref_pts = make_surface_cloud(rng, 600)
        T_true = small_transform(0.02 + 0.005 * i, 0.05)
        read_pts = np.asarray(se3.apply_transform(se3.transform_inverse(T_true), jnp.asarray(ref_pts)))
        refs.append(with_normals(ref_pts, capacity=640))
        readings.append(pc.from_points(read_pts, capacity=640))
        trues.append(T_true)
    res = register_batch_sharded(
        mesh, pc.stack(readings), pc.stack(refs),
        jnp.tile(jnp.eye(4), (B, 1, 1)), BASE_CFG,
    )
    for i in range(B):
        rot_err, trans_err = pose_error(np.asarray(res.transform)[i], trues[i])
        assert trans_err < 3e-3, (i, trans_err)


def test_register_point_sharded_matches_single(rng):
    mesh = make_mesh(batch=1, points=8)
    ref_pts = make_surface_cloud(rng, 1500)
    ref = with_normals(ref_pts, capacity=2048)
    T_true = small_transform()
    read_pts = np.asarray(se3.apply_transform(se3.transform_inverse(T_true), jnp.asarray(ref_pts)))
    reading = pc.from_points(read_pts, capacity=2048)

    res_sharded = register_point_sharded(mesh, reading, ref, jnp.eye(4), BASE_CFG)
    res_single = icp_mod.register_pair(reading, ref, jnp.eye(4), BASE_CFG)

    np.testing.assert_allclose(
        np.asarray(res_sharded.transform), np.asarray(res_single.transform), atol=1e-4
    )
    rot_err, trans_err = pose_error(np.asarray(res_sharded.transform), T_true)
    assert trans_err < 1e-3


def test_point_sharded_grid_matcher(rng):
    mesh = make_mesh(batch=2, points=4)
    ref_pts = make_surface_cloud(rng, 1500)
    ref = with_normals(ref_pts, capacity=2048)
    T_true = small_transform()
    read_pts = np.asarray(se3.apply_transform(se3.transform_inverse(T_true), jnp.asarray(ref_pts)))
    reading = pc.from_points(read_pts, capacity=2048)
    import dataclasses
    cfg = dataclasses.replace(BASE_CFG, matcher="grid", grid_table_size=1 << 13, grid_bucket_cap=32)
    res = register_point_sharded(mesh, reading, ref, jnp.eye(4), cfg)
    rot_err, trans_err = pose_error(np.asarray(res.transform), T_true)
    assert trans_err < 2e-3
