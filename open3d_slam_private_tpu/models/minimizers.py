"""Error minimizers: fused linearization + 6-DoF solves.

TPU re-design of libpointmatcher's ``ErrorMinimizers``:

- :func:`point_to_plane_normal_equations` fuses the residual/Jacobian pass of
  the reference's ``calculateOptimizationHessian`` (``ICP.cpp:1513-1566``):
  ``A = sum_i w_i J_i J_i^T``, ``b = -sum_i w_i J_i ((p_i - q_i) . n_i)``
  with ``J_i = [p_i x n_i ; n_i]`` — one einsum pass, no [N, 6, 6]
  intermediate.
- :func:`solve_normal_equations` mirrors ``solvePossiblyUnderdeterminedLinear
  System`` (``PointToPlane.cpp:112-265``): for symmetric (possibly singular)
  ``A`` the Jacobi-SVD minimum-norm solve is exactly the eigh-based
  pseudoinverse solve, which is cheap and batched on TPU.
- :func:`point_to_point_transform` is the weighted Kabsch/Umeyama solve of
  ``ErrorMinimizers/PointToPoint.cpp``.

``x`` layout everywhere: ``[omega(3), t(3)]`` (rotation first), matching the
reference solution vector.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from open3d_slam_private_tpu.geometry import se3


def point_to_plane_pairs(src_xyz, ref_xyz, ref_normals, weights):
    """Per-pair point-to-plane residual terms.

    Args: ``src_xyz [P, 3]`` transformed reading points, ``ref_xyz [P, 3]``
    matched reference points, ``ref_normals [P, 3]``, ``weights [P]``
    (0 for invalid pairs). Returns (J ``[P, 6]``, r ``[P]``) with
    J = [p x n ; n] and r = (p - q) . n.
    """
    cross = jnp.cross(src_xyz, ref_normals)
    J = jnp.concatenate([cross, ref_normals], axis=-1)
    r = jnp.sum((src_xyz - ref_xyz) * ref_normals, axis=-1)
    return J, r


def point_to_plane_normal_equations(src_xyz, ref_xyz, ref_normals, weights):
    """Weighted 6x6 normal equations (A, b) for point-to-plane."""
    J, r = point_to_plane_pairs(src_xyz, ref_xyz, ref_normals, weights)
    wJ = J * weights[:, None]
    A = jnp.einsum("pi,pj->ij", wJ, J)
    b = -jnp.einsum("pi,p->i", wJ, r)
    return A, b


def point_to_plane_4dof_normal_equations(src_xyz, ref_xyz, ref_normals, weights):
    """4-DoF (yaw + translation) variant: J = [(p x n)_z ; n], x = [yaw, t].

    Mirrors the reference's force4DOF mode which keeps only the z-row of the
    cross product (``PointToPlane.cpp`` force4DOF paths)."""
    cross_z = src_xyz[..., 0] * ref_normals[..., 1] - src_xyz[..., 1] * ref_normals[..., 0]
    J = jnp.concatenate([cross_z[:, None], ref_normals], axis=-1)  # [P, 4]
    r = jnp.sum((src_xyz - ref_xyz) * ref_normals, axis=-1)
    wJ = J * weights[:, None]
    A = jnp.einsum("pi,pj->ij", wJ, J)
    b = -jnp.einsum("pi,p->i", wJ, r)
    return A, b


def solve_normal_equations(A: jax.Array, b: jax.Array, rcond: float = 1e-7) -> jax.Array:
    """Minimum-norm least-squares solve of symmetric ``A x = b``.

    Equivalent to the reference's double-precision Jacobi-SVD solve for
    symmetric PSD systems; eigenvalues below ``rcond * max_eig`` are treated
    as zero (rank-deficient => minimum-norm solution, the behaviour of the
    QR-rank fallback in ``PointToPlane.cpp:194-240``).
    """
    w, V = jnp.linalg.eigh(A)
    aw = jnp.abs(w)
    cutoff = rcond * jnp.max(aw, axis=-1, keepdims=True)
    inv_w = jnp.where(aw > cutoff, 1.0 / w, 0.0)
    return V @ (inv_w * (V.T @ b))


def solve_symmetric_indefinite(M: jax.Array, rhs: jax.Array, rcond: float = 1e-7) -> jax.Array:
    """Min-norm pseudo-solve for symmetric *indefinite* systems (the KKT
    matrix of the equality-constrained solve). Same eigh route —
    symmetric indefinite matrices diagonalize orthogonally too."""
    return solve_normal_equations(M, rhs, rcond)


def delta_transform_from_x(x: jax.Array, force_4dof: bool = False) -> jax.Array:
    """Solved increment -> SE(3), using the reference's atan axis-angle
    reconstruction (``PointToPlane.cpp:340-370``)."""
    if force_4dof:
        yaw = x[..., 0]
        zeros = jnp.zeros_like(yaw)
        omega = jnp.stack([zeros, zeros, yaw], axis=-1)
        R = se3.exp_so3(omega)
        T = jnp.zeros(x.shape[:-1] + (4, 4), x.dtype)
        T = T.at[..., :3, :3].set(R)
        T = T.at[..., :3, 3].set(x[..., 1:4])
        T = T.at[..., 3, 3].set(1.0)
        return T
    return se3.rigid_from_axis_angle_atan(x)


def point_to_point_transform(src_xyz, ref_xyz, weights, axis_name=None) -> jax.Array:
    """Weighted Kabsch/Umeyama closed-form rigid alignment p -> q.

    The reference's PointToPointErrorMinimizer (``PointToPoint.cpp``):
    cross-covariance SVD with det-correction, translation from weighted
    centroids. Returns ``[4, 4]``. With ``axis_name``, the point axis is
    sharded and all sums are psum-reduced.
    """

    def allsum(v):
        return jax.lax.psum(v, axis_name) if axis_name is not None else v

    w = weights / jnp.maximum(allsum(jnp.sum(weights)), 1e-12)
    cp = allsum(jnp.einsum("p,pi->i", w, src_xyz))
    cq = allsum(jnp.einsum("p,pi->i", w, ref_xyz))
    P = src_xyz - cp
    Q = ref_xyz - cq
    H = allsum(jnp.einsum("p,pi,pj->ij", w, P, Q))
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.linalg.det(Vt.T @ U.T)
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], H.dtype)).at[2, 2].set(d)
    R = Vt.T @ D @ U.T
    t = cq - R @ cp
    T = jnp.eye(4, dtype=src_xyz.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(t)
    return T


def point_to_point_similarity_transform(src_xyz, ref_xyz, weights):
    """PointToPointSimilarityErrorMinimizer: Umeyama with isotropic scale.
    Returns (``[4, 4]`` transform with scaled rotation, scale scalar)."""
    w = weights / jnp.maximum(jnp.sum(weights), 1e-12)
    cp = jnp.einsum("p,pi->i", w, src_xyz)
    cq = jnp.einsum("p,pi->i", w, ref_xyz)
    P = src_xyz - cp
    Q = ref_xyz - cq
    H = jnp.einsum("p,pi,pj->ij", w, P, Q)
    U, S, Vt = jnp.linalg.svd(H)
    d = jnp.linalg.det(Vt.T @ U.T)
    ds = jnp.array([1.0, 1.0, 1.0], H.dtype).at[2].set(d)
    R = Vt.T @ jnp.diag(ds) @ U.T
    var_p = jnp.einsum("p,pi,pi->", w, P, P)
    scale = jnp.sum(S * ds) / jnp.maximum(var_p, 1e-12)
    T = jnp.eye(4, dtype=src_xyz.dtype)
    T = T.at[:3, :3].set(scale * R)
    T = T.at[:3, 3].set(cq - scale * (R @ cp))
    return T, scale
