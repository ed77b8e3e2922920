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
