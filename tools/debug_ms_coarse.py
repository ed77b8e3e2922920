"""Stage-by-stage debug of the multi-session coarse-alignment funnel."""
import os

if os.environ.get("DEBUG_CPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"

import dataclasses
import numpy as np
import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from test_multi_session import make_world, build_session, path_poses
from open3d_slam_private_tpu.geometry import se3
from open3d_slam_private_tpu.models import icp as icp_mod
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


def err(T):
    d = np.linalg.inv(np.asarray(T, np.float64)) @ T_ab_true
    return (np.linalg.norm(d[:3, 3]),
            np.arccos(np.clip((np.trace(d[:3, :3]) - 1) / 2, -1, 1)))


print("anchors A:", [np.round(e.anchor[:3, 3], 1).tolist() for e in a.submaps])
print("anchors B:", [np.round(e.anchor[:3, 3], 1).tolist() for e in b.submaps])

# --- Stage 1: seeds ---
pairs = [(ea, eb) for ea in a.submaps for eb in b.submaps]
yaws = np.linspace(0, 2 * np.pi, cfg.coarse_yaw_hypotheses, endpoint=False)
seeds, labels = [], []
for ia, ea in enumerate(a.submaps):
    for ib, eb in enumerate(b.submaps):
        inv_b = np.linalg.inv(eb.anchor)
        for yaw in yaws:
            R = np.eye(4)
            c, s = np.cos(yaw), np.sin(yaw)
            R[0, 0], R[0, 1], R[1, 0], R[1, 1] = c, -s, s, c
            seeds.append(ea.anchor @ R @ inv_b)
            labels.append(f"a{ia}b{ib}y{yaw:.2f}")
Ts_seed = np.stack(seeds)
seed_errs = np.array([err(T)[0] for T in Ts_seed])
print(f"\nseeds: n={len(seeds)} best terr={seed_errs.min():.3f} "
      f"({labels[int(np.argmin(seed_errs))]})")

# --- Stage 2: raw prune scores ---
b_tiny = ms._stride_subsample(skel_b, 512)
a_tiny = ms._stride_subsample(skel_a, 1024)


@jax.jit
def raw_scores(T_all):
    xb = b_tiny.padded_xyz()

    def one(T):
        x = xb @ T[:3, :3].T + T[:3, 3]
        d = jnp.linalg.norm(x[:, None, :] - a_tiny.padded_xyz()[None, :, :], axis=-1)
        d = jnp.where(a_tiny.mask[None, :], d, jnp.inf).min(axis=1)
        d = jnp.where(b_tiny.mask, d, jnp.inf)
        near = (d < cfg.coarse_match_dist).sum()
        cov = (d < 2.5 * cfg.coverage_dist).sum()
        return near / jnp.maximum(cov, 1)

    return jax.vmap(one)(T_all)


RCH = 128
rpad = (-len(Ts_seed)) % RCH
Ts_r = np.concatenate([Ts_seed, np.tile(np.eye(4), (rpad, 1, 1))]).astype(np.float32)
rs = np.concatenate([
    np.asarray(raw_scores(jnp.asarray(Ts_r[lo:lo + RCH])))
    for lo in range(0, len(Ts_r), RCH)
])[: len(Ts_seed)]
keep = np.argsort(-rs)[: cfg.prune_to]
best_seed = int(np.argmin(seed_errs))
print(f"prune: best-true seed rank={int(np.where(np.argsort(-rs) == best_seed)[0][0])} "
      f"(score {rs[best_seed]:.3f}, top score {rs.max():.3f}); "
      f"survivors' best terr={seed_errs[keep].min():.3f}")
Ts_pruned = Ts_seed[keep]
labels_p = [labels[k] for k in keep]

# --- Stage 3: coarse pull-in (two-phase: wide robust, then tight trim) ---
b_sub = ms._stride_subsample(skel_b, 1024)
a_sub = ms._stride_subsample(skel_a, 2048)
cfg_wide = dataclasses.replace(
    cfg.icp, matcher="brute", max_match_dist=8.0,
    trimmed_ratio=None, robust="cauchy", robust_scale=2.0,
    max_iterations=20, coarse_iterations=0,
    candidate_refresh_every=0, fast_trimming=False, fused_kernel=False,
    minimizer="point_to_plane",
)
cfg_tight = dataclasses.replace(
    cfg.icp, matcher="brute", max_match_dist=2.0,
    trimmed_ratio=0.85, max_iterations=15, coarse_iterations=0,
    candidate_refresh_every=0, fast_trimming=False, fused_kernel=False,
    minimizer="point_to_plane",
)
CH = 32
pad = (-len(Ts_pruned)) % CH
Ts_p = np.concatenate([Ts_pruned, np.tile(np.eye(4), (pad, 1, 1))]).astype(np.float32)
coarse_T = []
for lo in range(0, len(Ts_p), CH):
    r = icp_mod.register_hypotheses(b_sub, a_sub, jnp.asarray(Ts_p[lo:lo + CH]), cfg_wide)
    r2 = icp_mod.register_hypotheses(
        b_sub, a_sub, jnp.asarray(r.transform, jnp.float32), cfg_tight)
    coarse_T.append(np.asarray(r2.transform, np.float64))
coarse_T = np.concatenate(coarse_T)[: len(Ts_pruned)]
coarse_errs = np.array([err(T)[0] for T in coarse_T])
print(f"coarse ICP: best terr={coarse_errs.min():.3f} "
      f"({labels_p[int(np.argmin(coarse_errs))]}), n<1m: {(coarse_errs < 1).sum()}")

# --- Stage 4: rank + polish ---
print("devices:", jax.devices())
sc, _ = ms.coverage_scores(b_sub, skel_a, coarse_T, tight=0.4, r_cov=cfg.coverage_dist)
order = np.argsort(-sc)
print("\ncoarse ranking (top 10): score terr label")
for k in order[:10]:
    print(f"  {sc[k]:.3f} {coarse_errs[k]:7.3f} {labels_p[k]}")
bt = int(np.argmin(coarse_errs))
print(f"best-true coarse hyp: score={sc[bt]:.3f} "
      f"rank={int(np.where(order == bt)[0][0])} terr={coarse_errs[bt]:.3f}")

picked = ms._dedup_transforms(coarse_T, order, cfg.polish_top_k)
res = icp_mod.register_hypotheses(
    skel_b, skel_a, jnp.asarray(coarse_T[picked], jnp.float32), cfg.icp)
Ts_fine = np.asarray(res.transform, np.float64)
residual = np.asarray(res.residual, np.float64)
score, matched = ms.coverage_scores(
    skel_b, skel_a, Ts_fine, tight=cfg.tight_dist, r_cov=cfg.coverage_dist)
print("\nfinal: score matched resid terr rerr")
for i, T in enumerate(Ts_fine):
    te, re_ = err(T)
    print(f"  {score[i]:.3f} {int(matched[i]):6d} {residual[i]:.4f} {te:8.3f} {re_:.4f}")
