"""Instrument the FPFH-RANSAC path on the multi-session test scene."""
import numpy as np
import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from test_multi_session import make_world, build_session, path_poses
from open3d_slam_private_tpu.geometry import se3
from open3d_slam_private_tpu.models import ransac as ransac_mod
from open3d_slam_private_tpu.ops import fpfh as fpfh_mod
from open3d_slam_private_tpu.ops import grid_hash
from open3d_slam_private_tpu.slam import multi_session as ms

rng = np.random.default_rng(7)
world = make_world(rng)
a = build_session(world, path_poses([2, 6, 10, 14, 18]), np.eye(4), rng)
T_ab_true = np.asarray(
    se3.exp_se3(jnp.asarray([0.0, 0.0, 0.25, 2.0, -1.5, 0.0], jnp.float32)),
    np.float64,
)
b = build_session(world, path_poses([14, 18, 22, 26, 30, 34]),
                  np.linalg.inv(T_ab_true), rng)

cfg = ms.MultiSessionConfig(skeleton_capacity=8192)
skel_a = ms.session_skeleton(a, cfg.skeleton_capacity)
skel_b = ms.session_skeleton(b, cfg.skeleton_capacity)
print("skel counts:", int(skel_a.mask.sum()), int(skel_b.mask.sum()))

radius = 2.0 * cfg.icp.max_match_dist
for name, skel in [("a", skel_a), ("b", skel_b)]:
    g = grid_hash.build_grid(skel.padded_xyz(), skel.mask, radius, 1 << 14, 32,
                             normals=skel.normals)
    f = fpfh_mod.compute_fpfh(skel, g, knn=16)
    print(name, "fpfh nonzero rows:", int((jnp.abs(f).sum(1) > 0).sum()),
          "norm p50:", float(jnp.median(jnp.linalg.norm(f, axis=1))))

g_s = grid_hash.build_grid(skel_b.padded_xyz(), skel_b.mask, radius, 1 << 14, 32,
                           normals=skel_b.normals)
g_t = grid_hash.build_grid(skel_a.padded_xyz(), skel_a.mask, radius, 1 << 14, 32,
                           normals=skel_a.normals)
f_s = fpfh_mod.compute_fpfh(skel_b, g_s, knn=16)
f_t = fpfh_mod.compute_fpfh(skel_a, g_t, knn=16)

for ratio in [None, 0.98, 0.95, 0.9, 0.8]:
    ids, ok = fpfh_mod.mutual_matches(f_s, skel_b.mask, f_t, skel_a.mask,
                                      ratio=ratio)
    n_ok = int(ok.sum())
    # ground-truth check: match correct if target point within 0.5 m of
    # T_true @ source point
    src = np.asarray(skel_b.xyz)
    tgt = np.asarray(skel_a.xyz)[np.maximum(np.asarray(ids), 0)]
    src_t = src @ T_ab_true[:3, :3].T + T_ab_true[:3, 3]
    good = (np.linalg.norm(src_t - tgt, axis=1) < 0.5) & np.asarray(ok)
    print(f"ratio={ratio}: matches={n_ok} correct={int(good.sum())} "
          f"({(good.sum() / max(n_ok, 1)) * 100:.1f}%)")
    if n_ok >= 15:
        res = ransac_mod.ransac_align(
            skel_b.xyz, jnp.asarray(np.asarray(skel_a.xyz)[np.maximum(np.asarray(ids), 0)]),
            ok, jax.random.key(0),
            ransac_mod.RansacConfig(num_hypotheses=8192, inlier_dist=0.5,
                                    min_inliers=15),
        )
        if bool(res.ok):
            T = np.asarray(res.transform, np.float64)
            d = np.linalg.inv(T) @ T_ab_true
            print(f"  RANSAC ok inliers={int(res.inliers)} "
                  f"terr={np.linalg.norm(d[:3, 3]):.3f} "
                  f"rerr={np.arccos(np.clip((np.trace(d[:3, :3]) - 1) / 2, -1, 1)):.4f}")
        else:
            print(f"  RANSAC failed (inliers={int(res.inliers)})")
