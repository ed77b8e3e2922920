"""End-to-end evaluation run -> EVAL_r02.csv (committed artifact).

Two protocols, both written into one CSV report:

1. **Pair protocol** (≙ ``evaluations/eval_solution.cpp``): registration
   cases over the REAL Hokuyo / car clouds shipped with the reference
   (``libpointmatcher/examples/data``), run through
   :mod:`open3d_slam_private_tpu.evaluation` — the same code path as
   ``cli.py evaluate``. Ground truth is the checked-in golden
   ``.ref_trans`` for the 00000->00001 pair, and exact known perturbations
   (recovery protocol) for the remaining real clouds.

2. **Sequence protocol**: a realistically-simulated spinning-LiDAR drive
   (partial visibility, 1.5 cm sensor noise, 3% dynamic clutter, motion
   distortion with a per-point ``times`` channel) replayed through the FULL
   ``SlamPipeline`` — scan-to-scan odometry, scan-to-map X-ICP mapper,
   submap rolling, motion compensation — reporting per-frame absolute
   trajectory error (ATE).

Run: ``PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/run_eval.py``
(or in the default env for TPU wall times).
"""

import csv
import dataclasses
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF_DATA = "/root/reference/libpointmatcher/examples/data"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from open3d_slam_private_tpu import evaluation  # noqa: E402
from open3d_slam_private_tpu.geometry import se3  # noqa: E402
from open3d_slam_private_tpu.io import load_cloud  # noqa: E402
from open3d_slam_private_tpu.models import icp as icp_mod  # noqa: E402
from open3d_slam_private_tpu.models.localizability import DegeneracyConfig  # noqa: E402
from open3d_slam_private_tpu.ops import pointcloud as pc  # noqa: E402


PAIR_CFG = icp_mod.ICPConfig(
    knn=1,
    max_match_dist=2.0,
    matcher="grid",
    grid_table_size=1 << 15,
    grid_bucket_cap=256,
    trimmed_ratio=0.75,
    minimizer="point_to_plane",
    max_iterations=40,
    min_diff_rot=0.001,
    min_diff_trans=0.01,
    smooth_length=4,
)


def pair_cases():
    """Real-data registration cases."""
    golden = np.loadtxt(
        os.path.join(REF_DATA, "icp_data", "defaultIdentityDataPointsFilter.ref_trans")
    ).astype(np.float64)
    cases = []
    ref0, _ = load_cloud(os.path.join(REF_DATA, "cloud.00000.vtk"))
    read1, _ = load_cloud(os.path.join(REF_DATA, "cloud.00001.vtk"))
    cases.append(
        evaluation.EvalCase(read1, ref0, golden, np.eye(4), name="hokuyo_00001_to_00000_golden")
    )
    # Perturbation-recovery on each real cloud: reading = cloud moved by a
    # known transform; GT is that transform exactly.
    rng = np.random.default_rng(3)
    for fname in ["cloud.00000.vtk", "cloud.00001.vtk", "cloud.00002.vtk",
                  "car_cloud400.csv", "car_cloud401.csv"]:
        pts, _ = load_cloud(os.path.join(REF_DATA, fname))
        tw = np.r_[rng.uniform(-0.1, 0.1, 3), rng.uniform(-0.1, 0.1, 3)].astype(np.float32)
        T_gt = np.asarray(se3.exp_se3(jnp.asarray(tw)), np.float64)
        moved = (pts @ np.linalg.inv(T_gt)[:3, :3].T + np.linalg.inv(T_gt)[:3, 3]).astype(
            np.float32
        )
        # Independent resample noise so reading != reference pointwise.
        moved = moved + rng.normal(size=moved.shape).astype(np.float32) * 0.005
        cases.append(
            evaluation.EvalCase(
                moved, pts, T_gt, np.eye(4), name=f"{os.path.splitext(fname)[0]}_recovery"
            )
        )
    return cases


# ---------------------------------------------------------------------------
# Sequence protocol.
# ---------------------------------------------------------------------------


def synth_scene(n_ref, seed=0):
    """Same scene family as bench.py: ground plane + walls + columns."""
    rng = np.random.default_rng(seed)
    n_floor = n_ref // 2
    n_rest = n_ref - n_floor
    floor = np.c_[rng.uniform(-40, 40, (n_floor, 2)), rng.normal(0, 0.02, (n_floor, 1))]
    k = 8
    walls = []
    for i in range(k):
        m = n_rest // k
        ang = 2 * np.pi * i / k
        d = rng.uniform(12, 35)
        u = np.array([np.cos(ang), np.sin(ang)])
        t = rng.uniform(-12, 12, (m, 1))
        h = rng.uniform(0, 6, (m, 1))
        base = d * u[None, :] + t * np.array([[-u[1], u[0]]])
        walls.append(np.c_[base, h])
    pts = np.vstack([floor] + walls).astype(np.float32)
    return pts + rng.normal(size=pts.shape).astype(np.float32) * 0.01


def sample_sweep(scene, pose_start, twist, n, seed, wedge_deg=270.0, max_range=40.0,
                 noise=0.015, outlier_frac=0.03):
    """One distorted spinning-LiDAR sweep from a moving sensor.

    Point with phase p (azimuth in the end frame) is measured from
    pose_start @ exp(p*twist); the scan carries a ``times`` channel so the
    pipeline's undistortion has the same information the reference gets."""
    rng = np.random.default_rng(seed)
    pose_end = pose_start @ np.asarray(se3.exp_se3(jnp.asarray(twist, jnp.float32)), np.float64)
    local = (np.linalg.inv(pose_end) @ np.c_[scene, np.ones(len(scene))].T).T[:, :3]
    az = np.degrees(np.arctan2(local[:, 1], local[:, 0]))
    r = np.linalg.norm(local, axis=1)
    vis = np.flatnonzero((np.abs(az) <= wedge_deg / 2) & (r <= max_range) & (r > 1.0))
    n_out = int(n * outlier_frac)
    sel = rng.choice(vis, size=min(n - n_out, len(vis)), replace=len(vis) < n - n_out)
    phases = ((np.radians(az[sel]) + np.pi) / (2 * np.pi)).astype(np.float32)
    # Measure each point from its per-phase pose (vectorized: linearize the
    # pose over phase via per-point exp — exact, batched through vmap).
    tws = jnp.asarray(phases[:, None] * np.asarray(twist, np.float32)[None, :])
    T_p = np.asarray(jax.vmap(se3.exp_se3)(tws), np.float64)  # [k,4,4]
    T_full = pose_start[None] @ T_p
    world_pts = scene[sel].astype(np.float64)
    R = T_full[:, :3, :3]
    t = T_full[:, :3, 3]
    pts = np.einsum("kij,kj->ki", R.transpose(0, 2, 1), world_pts - t).astype(np.float32)
    pts += rng.normal(size=pts.shape).astype(np.float32) * noise
    clutter = np.c_[rng.uniform(-8, 8, (n_out, 2)), rng.uniform(0.2, 3.0, (n_out, 1))].astype(
        np.float32
    )
    all_pts = np.vstack([pts, clutter])
    all_phase = np.r_[phases, rng.uniform(0, 1, n_out).astype(np.float32)]
    cap = 1 << int(np.ceil(np.log2(max(len(all_pts), 2))))
    batch = pc.from_points(all_pts, capacity=cap, extras={"times": all_phase[:, None]})
    return batch, pose_end


def run_sequence(n_frames=40, n_pts=8192):
    from open3d_slam_private_tpu.slam.mapper import MapperConfig
    from open3d_slam_private_tpu.slam.odometry import OdometryConfig
    from open3d_slam_private_tpu.slam.pipeline import (
        MotionCompensationConfig,
        SlamConfig,
        SlamPipeline,
    )
    from open3d_slam_private_tpu.slam.submap_collection import SubmapCollectionConfig

    scene = synth_scene(200_000)
    icp_map = dataclasses.replace(
        icp_mod.ICPConfig(
            knn=1, max_match_dist=1.0, matcher="grid",
            grid_table_size=1 << 14, grid_bucket_cap=64,
            trimmed_ratio=0.85, minimizer="point_to_plane",
            max_iterations=12, coarse_iterations=8, coarse_stride=4,
            candidate_refresh_every=6, candidate_slack=0.25,
        ),
        degeneracy=DegeneracyConfig(method="equality_constraints"),
    )
    cfg = SlamConfig(
        odometry=OdometryConfig(voxel_size=0.2, max_range=40.0),
        mapper=MapperConfig(
            icp=icp_map, scan_voxel_size=0.1, submap_voxel_size=0.15,
            min_movement_for_insertion=0.05,
        ),
        submaps=SubmapCollectionConfig(
            submap_capacity=1 << 17, submap_voxel_size=0.15,
            creation_radius=25.0, activation_radius=27.0, carve_every_n=0,
        ),
        motion_compensation=MotionCompensationConfig(enabled=True, scan_duration=0.1),
        use_imu_attitude_init=False,
        loop_closure_enabled=False,
        use_external_odometry=False,
    )
    pipe = SlamPipeline(cfg)

    # Trajectory: accelerate from rest into an arc around the scene center.
    rows = []
    pose = np.eye(4)
    pose[:3, 3] = [6.0, -2.0, 1.2]
    t_wall0 = time.perf_counter()
    for i in range(n_frames):
        if i < 2:
            twist = np.zeros(6)
        else:
            twist = np.array([0.0, 0.0, 0.06, 0.45, 0.0, 0.0])  # yaw + forward / 0.1 s
        scan, pose_end = sample_sweep(scene, pose, twist, n_pts, seed=100 + i)
        pipe.process_scan(scan, time=0.1 * i)
        pose = pose_end
        est = pipe.pose
        # ATE needs gauge alignment to the first estimated pose (the pipeline
        # starts at identity; GT starts at pose[0]).
        rows.append((i, est.copy(), pose.copy()))
    wall = time.perf_counter() - t_wall0

    T_align = rows[0][2] @ np.linalg.inv(rows[0][1])
    out = []
    for i, est, gt in rows:
        est_w = T_align @ est
        delta = np.linalg.inv(est_w) @ gt
        r_err = float(
            np.arctan2(
                np.linalg.norm(
                    [delta[2, 1] - delta[1, 2], delta[0, 2] - delta[2, 0], delta[1, 0] - delta[0, 1]]
                )
                / 2.0,
                (np.trace(delta[:3, :3]) - 1) / 2.0,
            )
        )
        out.append((i, float(np.linalg.norm(delta[:3, 3])), r_err))
    return out, wall, n_frames, n_pts


def main():
    report = os.path.join(REPO, "EVAL_r02.csv")
    dev = str(jax.devices()[0])

    cases = pair_cases()
    results, summary = evaluation.evaluate(cases, PAIR_CFG)
    for r in results:
        print(f"{r.name:36s} trans={r.trans_err_m:.4f}m rot={r.rot_err_rad:.5f}rad "
              f"it={r.iterations} conv={r.converged}")
    print("pair summary:", summary)

    seq, seq_wall, n_frames, n_pts = run_sequence()
    ate_t = np.array([r[1] for r in seq])
    ate_r = np.array([r[2] for r in seq])
    seq_summary = dict(
        frames=n_frames, points_per_frame=n_pts,
        ate_trans_p50_m=float(np.median(ate_t)),
        ate_trans_max_m=float(ate_t.max()),
        ate_rot_p50_rad=float(np.median(ate_r)),
        ate_rot_max_rad=float(ate_r.max()),
        wall_s_total=seq_wall,
    )
    print("sequence summary:", seq_summary)

    with open(report, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["# protocol 1: pair registration (eval_solution analogue), device", dev])
        w.writerow(["name", "trans_err_m", "rot_err_rad", "iterations", "converged",
                    "overlap", "wall_s"])
        for r in results:
            w.writerow([r.name, f"{r.trans_err_m:.6f}", f"{r.rot_err_rad:.6f}",
                        r.iterations, r.converged, f"{r.overlap:.4f}", f"{r.wall_s:.3f}"])
        for k, v in summary.items():
            w.writerow([f"pair_{k}", v])
        w.writerow([])
        w.writerow(["# protocol 2: full-pipeline simulated spinning-LiDAR sequence "
                    "(X-ICP mapper, motion compensation, scan-to-scan odometry)"])
        w.writerow(["frame", "ate_trans_m", "ate_rot_rad"])
        for i, te, re_ in seq:
            w.writerow([i, f"{te:.5f}", f"{re_:.6f}"])
        for k, v in seq_summary.items():
            w.writerow([f"seq_{k}", v])
    print(f"report written to {report}")


if __name__ == "__main__":
    main()
