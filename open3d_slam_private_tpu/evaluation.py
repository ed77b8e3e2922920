"""Batch registration evaluation harness.

TPU counterpart of libpointmatcher's ``evaluations/eval_solution.cpp``: run a
registration protocol over a dataset of (reading, reference, ground-truth,
initial-guess) tuples, recording per-case pose error and timing, and emit
the summary table that fills ``BASELINE.md`` (time quantiles + error
quantiles, ≙ the stats the reference prints and its notebook plots).

Where the reference walks pairs with a thread pool, here all pairs with a
shared reference shape run as ONE vmapped device batch.

Dataset manifest: CSV with columns
    reading,reference,gt_00..gt_33[,init_00..init_33]
(16 row-major floats for each pose; init defaults to identity), the moral
equivalent of the ETH "Challenging datasets" protocol files
(``evaluations/official_solutions/*.yaml``).
"""

from __future__ import annotations

import csv
import dataclasses
import time
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class EvalCase:
    reading: np.ndarray  # [n, 3]
    reference: np.ndarray  # [m, 3]
    T_gt: np.ndarray  # [4, 4]
    T_init: np.ndarray  # [4, 4]
    name: str = ""


@dataclasses.dataclass
class EvalResult:
    name: str
    rot_err_rad: float
    trans_err_m: float
    iterations: int
    converged: bool
    overlap: float
    wall_s: float


def pose_errors(T_est: np.ndarray, T_gt: np.ndarray) -> Tuple[float, float]:
    delta = np.linalg.inv(T_est) @ T_gt
    rot = float(np.arccos(np.clip((np.trace(delta[:3, :3]) - 1) / 2, -1, 1)))
    trans = float(np.linalg.norm(delta[:3, 3]))
    return rot, trans


def load_manifest(path: str) -> List[EvalCase]:
    from open3d_slam_private_tpu.io import load_cloud

    cases = []
    with open(path) as f:
        for row in csv.DictReader(f):
            gt = np.array([float(row[f"gt_{i}{j}"]) for i in range(4) for j in range(4)]).reshape(4, 4)
            if "init_00" in row:
                init = np.array(
                    [float(row[f"init_{i}{j}"]) for i in range(4) for j in range(4)]
                ).reshape(4, 4)
            else:
                init = np.eye(4)
            reading, _ = load_cloud(row["reading"])
            reference, _ = load_cloud(row["reference"])
            cases.append(EvalCase(reading, reference, gt, init, name=row["reading"]))
    return cases


def evaluate(
    cases: Sequence[EvalCase],
    icp_config,
    reading_capacity: int = 16384,
    reference_capacity: int = 32768,
    normals_knn: int = 10,
) -> Tuple[List[EvalResult], dict]:
    """Run the protocol; returns per-case results + the summary table."""
    from open3d_slam_private_tpu.models import icp as icp_mod
    from open3d_slam_private_tpu.ops import normals as normals_mod
    from open3d_slam_private_tpu.ops import pointcloud as pc

    results: List[EvalResult] = []
    for case in cases:
        reference = pc.from_points(case.reference, capacity=reference_capacity)
        reference = normals_mod.estimate_normals(
            reference, knn=normals_knn,
            max_dist=4.0 * min(icp_config.max_match_dist, 1e6),
        )
        reading = pc.from_points(case.reading, capacity=reading_capacity)
        if icp_config.minimizer == "gicp":
            reading = normals_mod.estimate_normals(
                reading, knn=normals_knn,
                max_dist=4.0 * min(icp_config.max_match_dist, 1e6),
            )
        t0 = time.perf_counter()
        res = icp_mod.register_pair(
            reading, reference, jnp.asarray(case.T_init, jnp.float32), icp_config
        )
        T = np.asarray(res.transform)  # sync
        wall = time.perf_counter() - t0
        rot, trans = pose_errors(T, case.T_gt)
        results.append(
            EvalResult(
                name=case.name,
                rot_err_rad=rot,
                trans_err_m=trans,
                iterations=int(res.iterations),
                converged=bool(res.converged),
                overlap=float(res.overlap_ratio),
                wall_s=wall,
            )
        )

    trans = np.array([r.trans_err_m for r in results])
    rot = np.array([r.rot_err_rad for r in results])
    walls = np.array([r.wall_s for r in results])
    summary = dict(
        cases=len(results),
        converged_frac=float(np.mean([r.converged for r in results])),
        trans_err_p50_m=float(np.median(trans)),
        trans_err_p95_m=float(np.percentile(trans, 95)),
        rot_err_p50_rad=float(np.median(rot)),
        rot_err_p95_rad=float(np.percentile(rot, 95)),
        wall_p50_s=float(np.median(walls)),
        wall_mean_s=float(np.mean(walls)),
    )
    return results, summary


def write_report(path: str, results: Sequence[EvalResult], summary: dict) -> None:
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["name", "trans_err_m", "rot_err_rad", "iterations", "converged", "overlap", "wall_s"])
        for r in results:
            w.writerow([r.name, r.trans_err_m, r.rot_err_rad, r.iterations, r.converged, r.overlap, r.wall_s])
        w.writerow([])
        for k, v in summary.items():
            w.writerow([k, v])
