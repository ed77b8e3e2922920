"""Surface-normal and local-geometry estimation.

TPU analogue of the reference's ``SurfaceNormalDataPointsFilter``
(``DataPointsFilters/SurfaceNormal.cpp``: KNN -> covariance -> smallest
eigenvector) and its by-products (densities, eigen values/vectors
descriptors). The KNN comes from either the brute-force or the grid-hash
engine; the per-point 3x3 eigen-solve is a closed-form analytic routine
(no LAPACK loop, fully vectorized on the VPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from open3d_slam_private_tpu.ops import knn as knn_mod
from open3d_slam_private_tpu.ops.pointcloud import PointBatch


def eigh3x3(A: jax.Array):
    """Analytic symmetric 3x3 eigendecomposition, batched ``[..., 3, 3]``.

    Returns (eigenvalues ``[..., 3]`` ascending, eigenvectors ``[..., 3, 3]``
    with columns matching the eigenvalues). Uses the trigonometric closed
    form for eigenvalues and cross-product-based eigenvectors with robust
    column selection — accurate to ~1e-6 relative for well-scaled inputs and
    fully branch-free.
    """
    # Scale for numerical conditioning.
    scale = jnp.maximum(jnp.max(jnp.abs(A), axis=(-2, -1), keepdims=True), 1e-30)
    B = A / scale

    q = jnp.trace(B, axis1=-2, axis2=-1) / 3.0
    Bq = B - q[..., None, None] * jnp.eye(3, dtype=A.dtype)
    p2 = jnp.sum(Bq * Bq, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    detBq = jnp.linalg.det(Bq / p[..., None, None])
    r = jnp.clip(detBq / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    # Eigenvalues of B: q + 2 p cos(phi + 2k pi / 3), descending for k=0.
    e1 = q + 2.0 * p * jnp.cos(phi)
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e2 = 3.0 * q - e1 - e3
    evals = jnp.stack([e3, e2, e1], axis=-1)  # ascending

    def eigvec(lmbda, fallback):
        # Null space of (B - lambda I) via the two most independent rows;
        # falls back when the eigenvalue is (near-)repeated and the cross
        # products all vanish.
        M = B - lmbda[..., None, None] * jnp.eye(3, dtype=A.dtype)
        r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
        c01 = jnp.cross(r0, r1)
        c02 = jnp.cross(r0, r2)
        c12 = jnp.cross(r1, r2)
        n01 = jnp.sum(c01 * c01, axis=-1, keepdims=True)
        n02 = jnp.sum(c02 * c02, axis=-1, keepdims=True)
        n12 = jnp.sum(c12 * c12, axis=-1, keepdims=True)
        best = jnp.where(
            (n01 >= n02) & (n01 >= n12), c01, jnp.where(n02 >= n12, c02, c12)
        )
        nrm = jnp.linalg.norm(best, axis=-1, keepdims=True)
        best = jnp.where(nrm < 1e-12, fallback, best)
        nrm = jnp.linalg.norm(best, axis=-1, keepdims=True)
        return best / jnp.maximum(nrm, 1e-30)

    ez = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], A.dtype), B[..., 0, :].shape)
    v_large = eigvec(evals[..., 2], ez)
    # Fallback for the small vector: any direction orthogonal to v_large.
    ex = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], A.dtype), v_large.shape)
    ey = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], A.dtype), v_large.shape)
    alt = jnp.where(jnp.abs(v_large[..., :1]) > 0.9, ey, ex)
    ortho = jnp.cross(v_large, alt)
    v_small = eigvec(evals[..., 0], ortho)
    v_mid = jnp.cross(v_large, v_small)
    v_mid = v_mid / jnp.maximum(jnp.linalg.norm(v_mid, axis=-1, keepdims=True), 1e-30)
    # Re-orthogonalize the small vector for a right-handed consistent frame.
    v_small_o = jnp.cross(v_mid, v_large)
    vecs = jnp.stack([v_small_o, v_mid, v_large], axis=-1)  # columns
    return evals * scale[..., 0], vecs


@functools.partial(jax.jit, static_argnames=("knn", "return_eigen"))
def estimate_normals(
    batch: PointBatch,
    knn: int = 10,
    max_dist: float = jnp.inf,
    orient_towards=None,
    return_eigen: bool = False,
) -> PointBatch:
    """KNN-PCA normals, stored in the ``"normals"`` extra channel.

    Mirrors ``SurfaceNormalDataPointsFilter`` (knn neighbours including the
    point itself, covariance of neighbours, normal = eigenvector of smallest
    eigenvalue). ``orient_towards``: optional ``[3]`` viewpoint; normals are
    flipped to point toward it (the reference's ``OrientNormals`` filter with
    an observation direction).
    With ``return_eigen``, also stores ``"eigValues" [N, 3]`` (ascending) and
    ``"surfaceness"`` planarity weight, matching the descriptors the
    reference chain exposes.
    """
    xyz = batch.padded_xyz()
    res = knn_mod.knn_bruteforce(xyz, batch.mask, xyz, batch.mask, k=knn, max_dist=max_dist)
    nb = knn_mod.gather_matched(batch.xyz, jnp.maximum(res.ids, 0))  # [N, k, 3]
    return _normals_from_neighbors(batch, nb, res.valid(), orient_towards, return_eigen)


def _normals_from_neighbors(batch, nb, valid, orient_towards, return_eigen):
    xyz = batch.xyz
    w = valid.astype(xyz.dtype)[..., None]
    cnt = jnp.maximum(jnp.sum(w, axis=-2), 1.0)
    mean = jnp.sum(nb * w, axis=-2) / cnt
    centered = (nb - mean[:, None, :]) * w
    cov = jnp.einsum("nki,nkj->nij", centered, centered) / cnt[..., None]
    evals, evecs = eigh3x3(cov)
    normal = evecs[..., :, 0]  # smallest-eigenvalue column

    if orient_towards is not None:
        to_vp = jnp.asarray(orient_towards, xyz.dtype)[None, :] - xyz
        flip = jnp.sum(normal * to_vp, axis=-1, keepdims=True) < 0
        normal = jnp.where(flip, -normal, normal)

    enough = jnp.sum(valid, axis=-1) >= 3
    normal = jnp.where((batch.mask & enough)[:, None], normal, 0.0)
    out = batch.with_extras(normals=normal)
    if return_eigen:
        ev = jnp.where((batch.mask & enough)[:, None], evals, 0.0)
        # Planarity a la the reference's Gestalt descriptor
        # (``DataPointsFilters/Gestalt.cpp:436``): 2 (e2 - e1) / sum(e).
        lsum = jnp.maximum(jnp.sum(jnp.abs(ev), axis=-1), 1e-30)
        surfaceness = jnp.where(
            batch.mask & enough, 2.0 * (ev[:, 1] - ev[:, 0]) / lsum, 0.0
        )
        out = out.with_extras(eigValues=ev, surfaceness=surfaceness[:, None])
    return out


@functools.partial(jax.jit, static_argnames=("knn", "return_eigen"))
def estimate_normals_grid(
    batch: PointBatch,
    grid,
    knn: int = 10,
    max_dist: float = jnp.inf,
    orient_towards=None,
    return_eigen: bool = False,
) -> PointBatch:
    """Same as :func:`estimate_normals` but using a prebuilt GridHash over
    the batch itself (O(N) instead of O(N^2)); neighbor coordinates come
    straight out of the grid payload — no gathers."""
    from open3d_slam_private_tpu.ops import grid_hash

    xyz = batch.padded_xyz()
    res = grid_hash.grid_match(grid, xyz, batch.mask, k=knn, max_dist=max_dist)
    return _normals_from_neighbors(batch, res.xyz, res.valid(), orient_towards, return_eigen)


@functools.partial(jax.jit, static_argnames=())
def estimate_normals_moments(
    batch: PointBatch,
    grid,
    max_dist: float,
    orient_towards=None,
) -> PointBatch:
    """Radius-neighborhood PCA normals via streaming MOMENT accumulation.

    The rebuild-rate normals path: instead of exact KNN + top-k selection
    (:func:`estimate_normals_grid`, measured 365 ms @131k/k=8 on TPU —
    dominated by ``top_k``/``take_along_axis``, not the gathers), the
    covariance is accumulated directly over ALL within-radius candidates in
    one masked streaming pass (:func:`grid_moments`). Same
    smallest-eigenvector normal; the neighborhood is radius-capped instead
    of count-capped — equivalent quality for map references (usually MORE
    samples per point at mapping densities), ~25x faster. The reference's
    per-rebuild KD-tree + ``SurfaceNormal`` chain corresponds to grid +
    this pass.
    """
    from open3d_slam_private_tpu.ops import grid_hash

    cnt, _, cov = grid_hash.grid_moments(
        grid, batch.padded_xyz(), batch.mask, max_dist
    )
    evals, evecs = eigh3x3(cov)
    normal = evecs[..., :, 0]
    if orient_towards is not None:
        to_vp = jnp.asarray(orient_towards, batch.xyz.dtype)[None, :] - batch.xyz
        flip = jnp.sum(normal * to_vp, axis=-1, keepdims=True) < 0
        normal = jnp.where(flip, -normal, normal)
    enough = cnt >= 3.0
    normal = jnp.where((batch.mask & enough)[:, None], normal, 0.0)
    return batch.with_extras(normals=normal)


@functools.partial(jax.jit, static_argnames=("stride",))
def estimate_normals_organized(
    range_image_xyz: jax.Array,
    valid: jax.Array,
    orient_towards=None,
    stride: int = 1,
) -> jax.Array:
    """Normals for ORGANIZED clouds (range images) via cross products of
    image-neighbour differences — the O(1)-per-point path the reference
    implements in ``OrganizedCloudSurfaceNormalDataPointsFilter``.

    ``range_image_xyz [H, W, 3]``, ``valid [H, W]``. Returns normals
    ``[H, W, 3]`` (zeros where undefined). No KNN at all: pure shifts.
    """
    x = range_image_xyz
    # Central differences with edge replication (shift via roll + edge fix).
    right = jnp.roll(x, -stride, axis=1)
    left = jnp.roll(x, stride, axis=1)
    down = jnp.roll(x, -stride, axis=0)
    up = jnp.roll(x, stride, axis=0)
    du = right - left
    dv = down - up
    n = jnp.cross(du, dv)
    nn = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(nn, 1e-12)

    v_ok = (
        valid
        & jnp.roll(valid, -stride, axis=1)
        & jnp.roll(valid, stride, axis=1)
        & jnp.roll(valid, -stride, axis=0)
        & jnp.roll(valid, stride, axis=0)
        & (nn[..., 0] > 1e-12)
    )
    if orient_towards is not None:
        to_vp = jnp.asarray(orient_towards, x.dtype) - x
        flip = jnp.sum(n * to_vp, axis=-1, keepdims=True) < 0
        n = jnp.where(flip, -n, n)
    return jnp.where(v_ok[..., None], n, 0.0)
