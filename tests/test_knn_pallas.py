"""Pallas KNN kernel — interpreter-mode correctness on CPU (the compiled
path runs on real TPU; the bench exercises it there)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial import cKDTree

from open3d_slam_private_tpu.kernels.knn_pallas import knn_bruteforce_pallas


def test_pallas_knn_matches_kdtree(rng):
    q = rng.uniform(-5, 5, size=(300, 3)).astype(np.float32)
    r = rng.uniform(-5, 5, size=(700, 3)).astype(np.float32)
    d, i = knn_bruteforce_pallas(jnp.asarray(q), jnp.asarray(r), q_tile=64,
                                 r_tile=128, interpret=True)
    tree = cKDTree(r)
    d_ref, i_ref = tree.query(q, k=1)
    np.testing.assert_array_equal(np.asarray(i), i_ref)
    np.testing.assert_allclose(np.asarray(d), d_ref**2, rtol=1e-4, atol=1e-4)


def test_pallas_knn_nonaligned_sizes(rng):
    q = rng.uniform(-2, 2, size=(137, 3)).astype(np.float32)
    r = rng.uniform(-2, 2, size=(401, 3)).astype(np.float32)
    d, i = knn_bruteforce_pallas(jnp.asarray(q), jnp.asarray(r), q_tile=64,
                                 r_tile=128, interpret=True)
    tree = cKDTree(r)
    _, i_ref = tree.query(q, k=1)
    np.testing.assert_array_equal(np.asarray(i), i_ref)
    # Padded sentinel rows never matched.
    assert np.asarray(i).max() < 401


@pytest.mark.slow
def test_brute_pallas_matcher_registration(rng):
    """matcher="brute_pallas" must reproduce the plain brute engine result
    end-to-end (same correspondences -> same transform)."""
    import dataclasses

    from open3d_slam_private_tpu.geometry import se3
    from open3d_slam_private_tpu.models import icp as icp_mod
    from open3d_slam_private_tpu.ops import normals as normals_mod
    from open3d_slam_private_tpu.ops import pointcloud as pc

    pts = np.c_[rng.uniform(-5, 5, (1500, 2)),
                0.2 * np.sin(rng.uniform(-5, 5, (1500, 1)))].astype(np.float32)
    ref = pc.from_points(pts, capacity=2048)
    ref = normals_mod.estimate_normals(ref, knn=8, max_dist=1.0,
                                       orient_towards=(0.0, 0.0, 10.0))
    T_true = np.asarray(se3.exp_se3(jnp.asarray([0.01, -0.02, 0.03, 0.05, -0.04, 0.02],
                                                jnp.float32)))
    moved = pts @ np.linalg.inv(T_true)[:3, :3].T + np.linalg.inv(T_true)[:3, 3]
    reading = pc.from_points(moved.astype(np.float32), capacity=2048)

    base = icp_mod.ICPConfig(knn=1, max_match_dist=1.0, matcher="brute",
                             trimmed_ratio=0.85, max_iterations=15,
                             coarse_iterations=0, candidate_refresh_every=0)
    res_brute = icp_mod.register_pair(reading, ref, jnp.eye(4), base)
    res_pallas = icp_mod.register_pair(
        reading, ref, jnp.eye(4), dataclasses.replace(base, matcher="brute_pallas")
    )
    np.testing.assert_allclose(np.asarray(res_pallas.transform),
                               np.asarray(res_brute.transform), atol=1e-5)
    delta = np.linalg.inv(np.asarray(res_pallas.transform)) @ T_true
    assert np.linalg.norm(delta[:3, 3]) < 1e-3
